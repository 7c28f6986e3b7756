"""Multi-chip rendering over a jax device mesh.

Parallelism design (SURVEY §2.3): a frame is data-parallel over tile
space. Geometry stages (scans, flatten, tiling, coarse) are cheap and
run replicated inside the jit; the fine rasterization — the dominant
per-pixel cost — is sharded over contiguous stripes of the tile grid
via shard_map, each device interpreting the command tapes of its own
tiles. Only the final image assembly crosses chips (an all-gather of
image stripes along ICI), exactly the "tile-space sharding" extension
the reference's single-queue design admits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import clips as clips_mod
from ..pipeline import coarse as coarse_mod
from ..pipeline import drawobjs, fine_ref, tiling
from ..pipeline import flatten as flatten_mod
from ..pipeline.render import _draw_tags


def build_commands_stage(scene, layout, caps):
    """Geometry through coarse: everything before fine (replicated)."""
    xp = jnp
    fl = flatten_mod.flatten_stage(xp, scene, layout, caps)
    D = caps["n_draws_cap"]
    draw_tags_arr = _draw_tags(xp, scene, layout, D)
    dm = drawobjs.draw_monoid_scan(xp, draw_tags_arr)
    info, clip_idx_arr, clip_path_arr, tag, dd, di = drawobjs.draw_leaf(
        xp, scene, layout, dm, fl["path_trans_idx"], fl["path_draw_flags"],
        caps, tag=draw_tags_arr,
    )
    clip_bboxes, dm_path, dm_scene = clips_mod.clip_leaf(
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
    draw_bbox = coarse_mod.binning_bboxes(xp, dm, fl["path_bbox"], clip_bboxes, layout)
    paths = tiling.tile_alloc(xp, draw_bbox, tag, layout, caps)
    counted = tiling.path_count(xp, fl, paths, caps)
    segs = tiling.path_tiling(xp, fl, counted, caps)
    # Per-draw word table (mirrors pipeline/render.py).
    from ..pipeline import ops as _ops

    sc4 = _ops.gather_guarded(
        xp, scene, xp.concatenate([dd + k for k in range(4)])
    ).reshape(4, D)
    dtab = xp.concatenate([xp.transpose(sc4), info[:, 1:10]], axis=1)
    cmds = coarse_mod.build_commands(
        xp, scene, layout, dm, tag, dtab, draw_bbox, paths, counted,
        fl["path_draw_flags"], caps,
    )
    cmds["dtab"] = dtab
    return cmds, segs, info, counted


def make_sharded_render(mesh: Mesh, caps: dict, with_images: bool = False,
                        pallas_fine: bool = False, interpret: bool = False):
    """Build the jitted multi-chip render step for a mesh with a 'tiles'
    axis. Returns fn(scene, layout, ramps[, images]) -> (fine_out, flags)
    with fine_out sharded over the tile grid.

    pallas_fine=True runs the per-tile interpreter kernel
    (tpu/fine_pallas.py) inside the shard: the command slab and counts
    shard along the tile axis (static shapes), coverage rows / stop
    table / atlas stay replicated, and each device's kernel grid covers
    its own tile stripe (tile ids = stripe base + arange). interpret=True
    validates the same program on a CPU mesh (the driver's multichip
    dryrun)."""
    axis = "tiles"
    n_dev = mesh.shape[axis]
    GRID = caps["tile_grid_cap"]
    assert GRID % n_dev == 0, (GRID, n_dev)
    local = GRID // n_dev

    def fine_shard(tile_start, tile_end, cmds_rest, segs, info, scene, ramps,
                   images, layout):
        base = jax.lax.axis_index(axis) * local
        cmds_local = dict(cmds_rest)
        cmds_local["tile_start"] = tile_start
        cmds_local["tile_end"] = tile_end
        out, ovf = fine_ref.fine(
            jnp, scene, cmds_local, segs, info, ramps, images, layout, caps,
            tile_base=base,
        )
        ovf = jax.lax.pmax(ovf.astype(jnp.int32), axis)
        return out, ovf

    def fine_shard_pallas(slab, counts, area_blk, stops, img_flat, scalars,
                          wit):
        from .fine_pallas import make_fine_kernel

        base = jax.lax.axis_index(axis) * local
        tile_ids = (base + jnp.arange(local, dtype=jnp.int32))
        counts_l = jnp.concatenate([counts, wit.reshape(1)])
        caps_k = dict(caps)
        caps_k["max_stops"] = (stops.shape[1] - 1) // 5 if stops.shape[1] >= 6 else 2
        img_shape = None if img_flat is None else (
            int(img_flat.shape[1]), int(img_flat.shape[2]))
        call = make_fine_kernel(
            caps_k, img_shape, interpret=interpret,
            n_ramp_rows=stops.shape[0], n_programs=local,
        )
        out, ovf = call(counts_l, tile_ids, scalars, slab, area_blk,
                        stops,
                        img_flat if img_flat is not None
                        else jnp.zeros((4, 64, 256), jnp.float32))
        ovf_any = jax.lax.pmax(jnp.max(ovf), axis)
        return jnp.transpose(out, (1, 0, 2)), ovf_any

    def run(scene, layout, ramps, images=None):
        cmds, segs, info, counted = build_commands_stage(scene, layout, caps)
        overflow_pairs = cmds["overflow"]
        if pallas_fine:
            from ..pipeline.coverage import compute_area_rows
            from .fine_pallas import atlas_planar, build_cmd_slab

            area_blk, area_row_rec, rows_ovf = compute_area_rows(
                jnp, cmds, counted, caps)
            cmds2 = dict(cmds)
            cmds2["area_row"] = area_row_rec
            # Lane-padded stop table (pipeline/gradient.py rows).
            NRr, Wr = ramps.shape
            stops = jnp.zeros((NRr, 128), jnp.float32).at[:, :Wr].set(ramps)
            img_flat, _ = atlas_planar(images)
            caps_s = dict(caps)
            caps_s["max_stops"] = (Wr - 1) // 5
            slab, counts, slab_ovf = build_cmd_slab(
                jnp, cmds2, scene, info, caps_s)
            slab = slab.reshape(GRID, caps["cmds_per_tile"], 16)
            scalars = jnp.asarray(layout["base_color"], dtype=jnp.float32)
            wit = jnp.asarray(layout["width_in_tiles"], dtype=jnp.int32)
            sharded_fine = jax.shard_map(
                fine_shard_pallas,
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(), P(), P(), P(), P()),
                out_specs=(P(None, axis, None), P()),
                check_vma=False,
            )
            out, ovf = sharded_fine(
                slab, counts, area_blk, stops, img_flat, scalars, wit)
            flags = {
                "pairs_overflow": overflow_pairs,
                "cmd_slab_overflow": slab_ovf,
                "area_rows_overflow": rows_ovf,
                "blend_depth_overflow": (ovf & 1) > 0,
                "image_region_overflow": (ovf & 2) > 0,
            }
            return out, flags

        tile_start = cmds.pop("tile_start")
        tile_end = cmds.pop("tile_end")
        cmds.pop("n_cmds")
        cmds.pop("overflow")
        sharded_fine = jax.shard_map(
            fine_shard,
            mesh=mesh,
            in_specs=(
                P(axis),
                P(axis),
                P(),
                P(),
                P(),
                P(),
                P(),
                P(),
                P(),
            ),
            out_specs=(P(None, axis, None), P()),
            check_vma=False,
        )
        out, ovf = sharded_fine(
            tile_start, tile_end, cmds, segs, info, scene, ramps, images, layout
        )
        flags = {"pairs_overflow": overflow_pairs, "blend_depth_overflow": ovf > 0}
        return out, flags

    return jax.jit(run)


def dryrun(n_devices: int):
    """Compile + run one sharded frame on an n-device mesh with tiny
    shapes (used by the driver's multi-chip validation)."""
    import jello_tpu as jt
    from ..cpu.pipeline import build_layout_dict
    from ..renderer.estimate import estimate_caps
    from ..renderer.params import RenderParams
    from ..renderer.resolve import Resolver

    devices = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devices, ("tiles",))

    scene = jt.Scene()
    path = jt.BezPath().move_to(5, 5).cubic_to(30, 2, 50, 60, 90, 70).line_to(60, 10).close()
    scene.fill(
        jt.Fill.NON_ZERO,
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0, 0.7, 0.2, 1)),
        None,
        path,
    )
    scene.stroke(
        jt.Stroke(width=3).with_caps(jt.Cap.ROUND),
        jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0.8, 0.1, 0.1, 1)),
        None,
        jt.BezPath().move_to(10, 80).line_to(110, 90),
    )
    params = RenderParams(width=128, height=128, base_color=jt.Color.rgba(1, 1, 1, 1))
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    caps = estimate_caps(layout, params.width, params.height)
    caps["tile_grid_cap"] = max(caps["tile_grid_cap"], n_devices * 8)

    n = 1 << (len(scene_u32) - 1).bit_length()
    scene_padded = np.zeros(max(n, 1024), dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32
    ramps_arr = np.zeros((1, 11), dtype=np.float32)  # empty stop table

    ld = {k: jnp.asarray(v) for k, v in ld_np.items()}
    # The production configuration: per-tile interpreter kernel inside
    # the shard (interpret=True emulates Mosaic on the CPU mesh).
    run = make_sharded_render(mesh, caps, pallas_fine=True, interpret=True)
    out, flags = run(jnp.asarray(scene_padded), ld, jnp.asarray(ramps_arr))
    out.block_until_ready()
    # Cross-check against the single-device path.
    from ..cpu.pipeline import render as render_numpy_fn
    from ..renderer.params import RenderParams as RP

    ref, _, _ = render_numpy_fn(scene, params, caps=dict(caps))
    got = np.asarray(out)
    from ..pipeline.fine_ref import assemble_image

    img = assemble_image(np, got, ld_np)
    err = np.abs(np.asarray(img) - ref).max()
    assert err < 1e-3, f"sharded render mismatch: {err}"
    return err
