"""Capacity class estimation (the role of renderer/estimate.go).

The reference computes Wang-formula bump estimates during scene
construction but never wires them into buffer sizing (SURVEY §2,
estimate.go); buffers are fixed "hand picked" powers of two. The TPU
build needs static shapes per compiled size class, so we:

  1. derive cheap stream-based lower bounds from the encoding,
  2. bucket every capacity to a power of two (few recompiles),
  3. rely on device-side overflow flags + host retry-with-doubling for
     the rare underestimate (the reference's bump-failure protocol made
     into an actual retry loop).
"""

from __future__ import annotations

from dataclasses import dataclass


def _pow2(n: int, lo: int) -> int:
    v = max(int(n), lo, 1)
    p = 1
    while p < v:
        p <<= 1
    return p


def estimate_caps(layout, width: int, height: int, base=None) -> dict:
    """Initial capacity class for a resolved encoding."""
    caps = dict(base) if base else {}
    n_tags = layout.n_path_tags
    n_paths = max(layout.n_paths, 1)
    n_draws = max(layout.n_draw_objects, 1)
    n_clips = max(layout.n_clips, 1)
    wit = (width + 15) // 16
    hit = (height + 15) // 16
    grid = wit * hit

    n_slots = _pow2(((n_tags + 1023) // 1024) * 1024, 1024)
    euler = _pow2(n_tags * 8, 1 << 12)
    simple = _pow2(n_tags, 1 << 10)
    arc = _pow2(n_tags * 4, 1 << 10)
    caps.setdefault("max_emits", 16)
    caps.setdefault("max_iters", 52)
    caps.setdefault("blend_depth", 8)
    caps.setdefault("fine_seg_chunk", 8)
    caps.setdefault("cmds_per_tile", 64)
    caps.update(
        n_tag_slots=max(n_slots, caps.get("n_tag_slots", 0)),
        euler_line_cap=max(euler, caps.get("euler_line_cap", 0)),
        simple_line_cap=max(simple, caps.get("simple_line_cap", 0)),
        arc_line_cap=max(arc, caps.get("arc_line_cap", 0)),
        n_paths_cap=max(_pow2(n_paths, 64), caps.get("n_paths_cap", 0)),
        n_draws_cap=max(_pow2(n_draws, 64), caps.get("n_draws_cap", 0)),
        n_clips_cap=max(_pow2(n_clips, 16), caps.get("n_clips_cap", 0)),
        info_cap=max(_pow2(n_draws * 10 + 16, 1 << 10), caps.get("info_cap", 0)),
        tiles_cap=max(_pow2(4 * grid + 8 * n_draws, 1 << 12), caps.get("tiles_cap", 0)),
        seg_cap=max(_pow2(n_tags * 32, 1 << 14), caps.get("seg_cap", 0)),
        row_cap=max(_pow2(n_tags * 16, 1 << 12), caps.get("row_cap", 0)),
        pair_cap=max(_pow2(4 * grid + 8 * n_draws, 1 << 12), caps.get("pair_cap", 0)),
        tile_grid_cap=max(_pow2(grid, 256), caps.get("tile_grid_cap", 0)),
        area_rows_cap=max(
            _pow2(2 * grid + 8 * n_draws, 1 << 12), caps.get("area_rows_cap", 0)
        ),
    )
    caps["line_cap"] = max(
        _pow2(caps["euler_line_cap"] + caps["simple_line_cap"] + caps["arc_line_cap"], 1),
        caps.get("line_cap", 0),
    )
    return caps


# Which overflow flag grows which capacities on retry.
GROW_ON_FLAG = {
    "flatten_overflow": ("euler_line_cap", "simple_line_cap", "arc_line_cap", "line_cap", "max_emits"),
    "tiles_overflow": ("tiles_cap",),
    "segs_overflow": ("seg_cap", "row_cap"),
    "pairs_overflow": ("pair_cap",),
    "blend_depth_overflow": ("blend_depth",),
    "cmd_slab_overflow": ("cmds_per_tile",),
    "area_rows_overflow": ("area_rows_cap",),
}


def grow_caps(caps: dict, flags: dict) -> dict:
    """Double the capacities implicated by raised overflow flags."""
    out = dict(caps)
    for flag, keys in GROW_ON_FLAG.items():
        if bool(flags.get(flag, False)):
            for k in keys:
                if k == "max_emits":
                    out[k] = min(out[k] * 2, 64)
                    out["max_iters"] = 2 * out[k] + 20
                else:
                    out[k] = out[k] * 2
    out["line_cap"] = max(
        out["line_cap"],
        _pow2(out["euler_line_cap"] + out["simple_line_cap"] + out["arc_line_cap"], 1),
    )
    return out
