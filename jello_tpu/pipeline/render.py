"""Full-frame pipeline orchestration (xp-generic).

The analog of the reference's dispatch graph (renderer/render.go
RenderEncodingCoarse + RecordFine): a single function from the packed
scene buffer to the rendered image. Under jax.numpy the whole thing
traces into one XLA program; buffer lifetimes become XLA's problem
(SURVEY §7.1). Capacities (`caps`) are static per size class; every
data-dependent allocation reports overflow instead of failing, and the
host re-renders with a larger class (the reference's bump-failure
protocol, renderer/render.go:458-461, made into an actual retry loop).
"""

from __future__ import annotations

from . import clips as clips_mod
from . import coarse as coarse_mod
from . import ops
from . import drawobjs
from . import fine_ref
from . import flatten as flatten_mod
from . import tiling


LAYOUT_INT_FIELDS = (
    "path_tag_base",
    "path_data_base",
    "draw_tag_base",
    "draw_data_base",
    "transform_base",
    "style_base",
    "n_path_tags",
    "n_paths",
    "n_draw_objects",
    "n_clips",
    "width_in_tiles",
    "height_in_tiles",
    "target_width",
    "target_height",
)


def pack_layout(ld: dict):
    """Pack the per-frame layout scalars + base color into one uint32
    array (a single host->device transfer per frame)."""
    import numpy as np

    out = np.zeros(len(LAYOUT_INT_FIELDS) + 4, dtype=np.uint32)
    for i, k in enumerate(LAYOUT_INT_FIELDS):
        out[i] = np.uint32(int(ld[k]))
    out[len(LAYOUT_INT_FIELDS) :] = np.asarray(
        ld["base_color"], dtype=np.float32
    ).view(np.uint32)
    return out


def unpack_layout(xp, packed):
    from . import ops

    ld = {}
    for i, k in enumerate(LAYOUT_INT_FIELDS):
        ld[k] = packed[i].astype(xp.int32)
    ld["base_color"] = ops.bitcast_u32_f32(xp, packed[len(LAYOUT_INT_FIELDS) :])
    return ld


def render_frame(xp, scene, layout, ramps, images, caps, fine_impl=None,
                 with_stats=False, stats_only=False):
    """Render one frame.

    scene:  uint32[*] packed scene buffer (padded to the size class).
    layout: dict of scalars (may be traced): path_tag_base,
        path_data_base, draw_tag_base, draw_data_base, transform_base,
        style_base, n_path_tags, n_paths, n_draw_objects, n_clips,
        width_in_tiles, height_in_tiles, target_width, target_height,
        base_color (f32[4] premultiplied).
    ramps:  f32[NR, W] gradient stop-table rows (pipeline/gradient.py).
    images: f32[NI, IH, IW, 4] image atlas (non-premultiplied linear)
        or None.
    caps:   static capacity dict (sole authority: renderer/estimate.py).

    Returns (fine_out [4, GRID, 256], flags dict of overflow booleans).
    """
    from ..profiler import named_scope

    if stats_only:
        # Counting-only host pass (tpu/render._host_calibrate): stages
        # skip payload work that the capacity counters don't need.
        caps = dict(caps, _stats_only=True)
    with named_scope("flatten"):
        fl = flatten_mod.flatten_stage(xp, scene, layout, caps)

    D = caps["n_draws_cap"]
    with named_scope("draw_leaf"):
        draw_tags_arr = _draw_tags(xp, scene, layout, D)
        dm = drawobjs.draw_monoid_scan(xp, draw_tags_arr)
        info, clip_idx_arr, clip_path_arr, tag, dd, di = drawobjs.draw_leaf(
            xp,
            scene,
            layout,
            dm,
            fl["path_trans_idx"],
            fl["path_draw_flags"],
            caps,
            tag=draw_tags_arr,
        )
    with named_scope("clip_leaf"):
        from . import ops as _ops

        clip_impl = (
            clips_mod.clip_leaf_vectorized if _ops.is_jax(xp) else clips_mod.clip_leaf
        )
        clip_bboxes, dm_path, dm_scene = clip_impl(
            xp,
            clip_idx_arr,
            clip_path_arr,
            fl["path_bbox"],
            dm["path_idx"].astype(xp.int32),
            dm["scene_offset"].astype(xp.int32),
            layout,
            caps,
        )
    dm = dict(dm)
    dm["path_idx"] = dm_path
    dm["scene_offset"] = dm_scene
    dd = (layout["draw_data_base"] + dm_scene).astype(xp.int32)
    # Per-draw word table consumed by coarse (blend/alpha columns), the
    # fine command packers (build_records) and fine_ref: columns
    # scene[dd+0..3] (patched dd: EndClips read their Begin's
    # blend/alpha) + info words 1..9. The four scene words ride ONE
    # merged gather; info is already a [D, 10] table (draw_leaf).
    sc4 = ops.gather_guarded(
        xp, scene, xp.concatenate([dd + k for k in range(4)])
    ).reshape(4, D)
    dtab = xp.concatenate([xp.transpose(sc4), info[:, 1:10]], axis=1)

    with named_scope("tile_alloc"):
        draw_bbox = coarse_mod.binning_bboxes(xp, dm, fl["path_bbox"], clip_bboxes, layout)
        paths = tiling.tile_alloc(xp, draw_bbox, tag, layout, caps)
    with named_scope("path_count"):
        counted = tiling.path_count(xp, fl, paths, caps)
    with named_scope("path_tiling"):
        segs = tiling.path_tiling(xp, fl, counted, caps)
    with named_scope("coarse"):
        cmds = coarse_mod.build_commands(
            xp,
            scene,
            layout,
            dm,
            tag,
            dtab,
            draw_bbox,
            paths,
            counted,
            fl["path_draw_flags"],
            caps,
        )
        cmds["dtab"] = dtab
    flags = {
        "flatten_overflow": fl["overflow"],
        "tiles_overflow": paths["overflow"],
        "segs_overflow": counted["overflow"],
        "pairs_overflow": cmds["overflow"],
    }
    # Actual-use counters (exact for this frame). Capacity-independent
    # where the clamped expansion totals would bake pre-calibration fat
    # into the calibrated class. Consumed two ways: fetched from the
    # device once per scene shape (with_stats), or computed on the HOST
    # under numpy before the first compile (stats_only — fine is the
    # one stage whose host cost is prohibitive at scale and whose
    # numbers capacity sizing doesn't need).
    # Legacy-tile count (tiles needing the per-tile interpreter: image
    # paints, nested clips, non-trivial blends): sizes the hybrid fine
    # pass's interpreter grid (tpu/fine_hybrid.py). Shares the exact
    # classification fine_hybrid uses so the host calibration sees the
    # same count the device pass will.
    _lt, _, _, _ = coarse_mod.classify_legacy_tiles(xp, cmds, caps)
    # Image-record count: sizes the image-tap kernel grid
    # (tpu/image_tap.py; same predicate as its compaction).
    from ..pipeline.coarse import CMD_IMAGE as _CMD_IMAGE

    _tile32 = cmds["tile"].astype(xp.int32)
    _img_recs = xp.sum(
        (
            (cmds["kind"] == _CMD_IMAGE)
            & (_tile32 < caps["tile_grid_cap"])
            & (_tile32 >= 0)
        ).astype(xp.int32)
    )
    stats = {
        "legacy_tiles": xp.sum(_lt),
        "img_recs": _img_recs,
        "work_a": fl["n_work_a"],
        "work_b": fl["n_work_b"],
        "euler_lines": fl["e_real"],
        "simple_lines": fl["s_total"],
        "arc_lines": fl["a_total"],
        "tiles": paths["n_tiles"],
        "segs": counted["real_cross"],
        "bd_rows": counted["real_bd_rows"],
        "cross_lines": counted["real_cross_lines"],
        "row_lines": counted["real_bd_lines"],
        "area_rows": counted["n_rows"],
        "pairs": cmds["pair_total"],
        "cmds": cmds["n_cmds"],
        "max_cmds": cmds["max_cmds"],
        "lockstep_iters": fl["lockstep_iters"],
    }
    if stats_only:
        return None, flags, stats
    from ..profiler import named_scope as _ns

    with _ns("fine"):
        if fine_impl is None:
            fine_out, depth_overflow = fine_ref.fine(
                xp, scene, cmds, segs, info, ramps, images, layout, caps
            )
            flags["blend_depth_overflow"] = depth_overflow
        else:
            fine_out, fine_flags = fine_impl(
                scene, cmds, segs, counted, info, ramps, images, layout, caps
            )
            flags.update(fine_flags)
    if with_stats:
        return fine_out, flags, stats
    return fine_out, flags


def _draw_tags(xp, scene, layout, D):
    from . import ops
    from ..encoding.draw import DRAW_TAG_NOP

    i = xp.arange(D, dtype=xp.int32)
    t = ops.gather_guarded(xp, scene, layout["draw_tag_base"] + i)
    return xp.where(i < layout["n_draw_objects"], t, xp.uint32(DRAW_TAG_NOP))
