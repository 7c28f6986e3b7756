"""Measure sharded2's replicated-coarse scaling ceiling (VERDICT r4
item #10): how per-chip work splits between the 1/n-sharded stages and
the replicated coarse stage as the device count grows, and where coarse
becomes the bottleneck.

Method: derive the per-device capacity class with shard_caps(n) for the
config5 (tiger+text) calibrated class and count the ROWS each section
processes — on this fabric frame time is (heavy-op rows) x (~10 ns/row)
plus kernel time, so row counts are the honest scaling proxy. The
replicated section's rows are n-independent by construction; the
crossover is where they exceed the sharded section's rows/chip.

Anchored to the round-5 device trace (config5, 1 chip): sharded-section
stages (flatten + path_count + coverage + fine) = 155.3 ms, replicated
section (draw/clip/tile_alloc/coarse) = 17.7 + 1.5 + 1.8 ms.

Run: JAX_PLATFORMS=cpu python tools/sharded_ceiling.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.renderer.estimate import estimate_caps_from_scene
    from jello_tpu.renderer.params import RenderParams  # noqa: F401
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu.sharded2 import shard_caps

    scene, params = CONFIGS[5]()
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    build_layout_dict(layout, params)
    caps = estimate_caps_from_scene(
        scene_u32, layout, params.width, params.height, None
    )

    # Row tallies. Sharded section: every capacity that scales 1/n.
    def sharded_rows(c):
        return (
            c["n_tag_slots"]              # decode/slot geometry
            + c["line_cap"] * 3           # placement + DDA params + sort in
            + c["seg_cap"] * 3            # crossing expansion + sort + scatter
            + c["row_cap"]                # backdrop rows
            + c["cross_lines_cap"] + c["row_lines_cap"]  # compactions
            + c["area_rows_cap"] * 2      # coverage rows + fine cov windows
            + c.get("cmd_cap", c["pair_cap"]) * 2  # records + fine
        )

    # Replicated section: draw/clip scans, tile_alloc, coarse.
    def replicated_rows(c):
        return (
            c["n_draws_cap"] * 3          # draw scan + leaf + clip
            + c["tiles_cap"] * 2          # tile metadata + T-cumsum
            + c["pair_cap"] * 2           # coarse pair expansion + sort
            + c.get("cmd_cap", c["pair_cap"])  # PTCL serialize
        )

    # Measured single-chip anchor (round-5 device trace, config5).
    MEAS_SHARD_MS = 155.3
    MEAS_REPL_MS = 21.0

    base_sh = sharded_rows(caps)
    base_re = replicated_rows(caps)
    print(f"config5 class: sharded-section rows {base_sh:,}, "
          f"replicated rows {base_re:,}")
    print(f"{'n':>3} {'rows/chip shard':>16} {'rows repl':>11} "
          f"{'ms shard':>9} {'ms repl':>8} {'frame ms':>9} {'repl %':>7}")
    crossover = None
    for n in (1, 2, 4, 8, 16, 32, 64):
        c = shard_caps(caps, n) if n > 1 else caps
        sh = sharded_rows(c)
        re_ = replicated_rows(c)
        ms_sh = MEAS_SHARD_MS * sh / base_sh
        ms_re = MEAS_REPL_MS * re_ / base_re
        tot = ms_sh + ms_re
        pct = 100.0 * ms_re / tot
        print(f"{n:>3} {sh:>16,} {re_:>11,} {ms_sh:>9.1f} {ms_re:>8.1f} "
              f"{tot:>9.1f} {pct:>6.1f}%")
        if crossover is None and ms_re > ms_sh:
            crossover = n
    print(f"\ncrossover (replicated coarse > sharded work/chip): "
          f"n = {crossover}")
    print("beta (imbalance margin) = 2.0: sharded rows stop halving "
          "exactly; see shard_caps()")
    return 0


if __name__ == "__main__":
    sys.exit(main())
