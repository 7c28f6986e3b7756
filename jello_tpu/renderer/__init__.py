"""Host-side renderer support: resolve, layout, ramp cache, estimation."""
