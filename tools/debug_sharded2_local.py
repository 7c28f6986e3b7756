"""Reproduce device-1's stripe-local fine call WITHOUT shard_map.

Builds cmds_local / segs_local / counted_local for stripe d from the
(verified-correct) global arrays, runs fine_hybrid single-device, and
compares the stripe's tiles against the numpy reference image.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import jello_tpu as jt
from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
from jello_tpu.cpu.pipeline import render as render_numpy_fn
from jello_tpu.pipeline import clips as clips_mod
from jello_tpu.pipeline import coarse as coarse_mod
from jello_tpu.pipeline import drawobjs, ops, tiling
from jello_tpu.pipeline import flatten as flatten_mod
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.pipeline.render import _draw_tags
from jello_tpu.renderer.estimate import estimate_caps
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.tpu.sharded2 import shard_caps
from tools.debug_sharded2 import build_scene

n = 8
d = int(sys.argv[1]) if len(sys.argv) > 1 else 1

scene = build_scene()
W = H = 128
params = RenderParams(width=W, height=H, base_color=jt.Color.rgba(1, 1, 1, 1))
layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
ld_np = build_layout_dict(layout, params)
caps = estimate_caps(layout, params.width, params.height)
caps_l = shard_caps(caps, n)
caps_l["_expand_interpret"] = True
caps_l["_expand_pallas"] = True
caps_l["_coverage_pallas"] = True

nsc = 1 << (len(scene_u32) - 1).bit_length()
scene_padded = np.zeros(max(nsc, 1024), dtype=np.uint32)
scene_padded[: len(scene_u32)] = scene_u32
ramps_arr = stops_table_or_empty(ramps)
atlas = build_image_atlas(images)

# Global numpy stages.
xp = np
sc = scene_padded
ld = dict(ld_np)
fl = flatten_mod.flatten_stage(xp, sc, ld, caps)
D = caps["n_draws_cap"]
dta = _draw_tags(xp, sc, ld, D)
dm = drawobjs.draw_monoid_scan(xp, dta)
info, cia, cpa, tag, dd, di = drawobjs.draw_leaf(
    xp, sc, ld, dm, fl["path_trans_idx"], fl["path_draw_flags"], caps)
cb, dmp, dms = clips_mod.clip_leaf(
    xp, cia, cpa, fl["path_bbox"], dm["path_idx"].astype(xp.int32),
    dm["scene_offset"].astype(xp.int32), ld, caps)
dm = dict(dm)
dm["path_idx"] = dmp
dm["scene_offset"] = dms
dd = (ld["draw_data_base"] + dms).astype(xp.int32)
draw_bbox = coarse_mod.binning_bboxes(xp, dm, fl["path_bbox"], cb, ld)
paths = tiling.tile_alloc(xp, draw_bbox, tag, ld, caps)
counted = tiling.path_count(xp, fl, paths, caps)
sc4 = np.stack(
    [sc[np.clip(dd + k, 0, len(sc) - 1)].astype(np.uint32) for k in range(4)],
    axis=1)
dtab = np.concatenate([sc4, np.asarray(info)[:, 1:10]], axis=1)
cmds = coarse_mod.build_commands(
    xp, sc, ld, dm, tag, dtab, draw_bbox, paths, counted,
    fl["path_draw_flags"], caps)
cmds["dtab"] = dtab

GRID = caps["tile_grid_cap"]
T = caps["tiles_cap"]
local_tiles = GRID // n
CC_l = caps_l["cmd_cap"]
PEX = caps_l["seg_ex_cap"]
stripe_lo, stripe_hi = d * local_tiles, (d + 1) * local_tiles

# ---- device-local command slice (mimic slc) ------------------------------
st = np.asarray(cmds["tile"]).astype(np.int32)
lo_d = int((st < stripe_lo).sum())
cnt_d = int(((st >= stripe_lo) & (st < stripe_hi)).sum())
print("lo_d", lo_d, "cnt_d", cnt_d, "CC_l", CC_l)


def slc(a, fill):
    a = np.asarray(a)
    pad = np.full((CC_l,) + a.shape[1:], fill, dtype=a.dtype)
    ext = np.concatenate([a, pad], axis=0)
    out = ext[lo_d : lo_d + CC_l]
    j = np.arange(CC_l)
    live = j < cnt_d
    shape = (CC_l,) + (1,) * (a.ndim - 1)
    return np.where(live.reshape(shape), out, fill)


# ---- device-local segment stream (mimic routing) -------------------------
# Take the global slot-sorted stream, keep rows whose slot's tile is in
# the stripe, place into an n*PEX array sorted by slot.
segs_g = counted["segs"]
slot_g = np.asarray(counted["sorted_slot"])
tx = np.asarray(paths["tile_tx"])
ty = np.asarray(paths["tile_ty"])
gid = ty * int(ld_np["width_in_tiles"]) + tx
live_seg = slot_g < T
seg_gid = np.where(live_seg, gid[np.clip(slot_g, 0, T - 1)], 10**9)
mine = live_seg & (seg_gid >= stripe_lo) & (seg_gid < stripe_hi)
order = np.argsort(np.where(mine, slot_g, T), kind="stable")
NLOC = n * PEX
rows = np.full((NLOC, 6), 0, dtype=np.float32)
rows[:, 0] = T
take = order[:NLOC]
src = np.stack(
    [np.where(mine, slot_g, T).astype(np.float32)[take],
     np.asarray(segs_g["seg_x0"])[take], np.asarray(segs_g["seg_y0"])[take],
     np.asarray(segs_g["seg_x1"])[take], np.asarray(segs_g["seg_y1"])[take],
     np.asarray(segs_g["seg_y_edge"])[take]], axis=1)
m = min(NLOC, len(take))
rows[:m] = src[:m]
sorted_slot = rows[:, 0].astype(np.int32)
segs_local = {
    "seg_x0": rows[:, 1], "seg_y0": rows[:, 2], "seg_x1": rows[:, 3],
    "seg_y1": rows[:, 4], "seg_y_edge": rows[:, 5],
}
count_local = np.zeros(T + 1, np.int32)
np.add.at(count_local, np.where(sorted_slot < T, sorted_slot, T), 1)
count_local = count_local[:T]
start_local = np.concatenate([[0], np.cumsum(count_local)[:-1]]).astype(np.int32)
owned = count_local > 0

cmds_local = {
    "tile": slc(np.asarray(cmds["tile"]).astype(np.int32), GRID),
    "kind": slc(cmds["kind"], 0),
    "seg_start": np.where(
        slc(np.asarray(cmds["tile"]).astype(np.int32), GRID) < GRID,
        start_local[np.clip(slc(cmds["tile_slot"], T), 0, T - 1)], 0),
    "seg_count": slc(cmds["seg_count"], 0),
    "backdrop": slc(cmds["backdrop"], 0),
    "tile_slot": slc(cmds["tile_slot"], T),
    "flags": slc(cmds["flags"], 0),
    "di": slc(cmds["di"], 0),
    "dd": slc(cmds["dd"], 0),
    "draw": slc(cmds["draw"], 0),
    "dtab": np.asarray(cmds["dtab"]),
}
stl = cmds_local["tile"]
i_ids = np.arange(CC_l, dtype=np.int32)
prev = np.concatenate([[-1], stl[:-1]])
nxt_t = np.concatenate([stl[1:], [GRID + 1]])
first = (stl != prev) & (stl < GRID)
last = (stl != nxt_t) & (stl < GRID)
tile_start = np.zeros(GRID, np.int32)
tile_end = np.zeros(GRID, np.int32)
tile_start[stl[first]] = i_ids[first]
tile_end[stl[last]] = i_ids[last] + 1
cmds_local["tile_start"] = tile_start
cmds_local["tile_end"] = tile_end
cmds_local["max_cmds"] = int((tile_end - tile_start).max())

bd_prefix = np.asarray(counted["backdrop"])
counted_local = {
    "segs": segs_local,
    "sorted_slot": sorted_slot,
    "seg_count": np.where(owned, np.asarray(counted["seg_count"]), 0),
    "seg_start": start_local,
    "backdrop": bd_prefix,
    "n_rows": int(owned.sum()),
}

# ---- run fine_hybrid single-device ---------------------------------------
from jello_tpu.tpu.fine_hybrid import fine_hybrid
from jello_tpu.pipeline.fine_ref import assemble_image

jl = {k: jnp.asarray(np.asarray(v)) for k, v in ld_np.items()}
to_j = lambda tree: {k: (jnp.asarray(v) if not isinstance(v, dict)
                         else {kk: jnp.asarray(vv) for kk, vv in v.items()})
                     for k, v in tree.items()}
(compact, tile2rank), fflags = fine_hybrid(
    jnp.asarray(scene_padded), to_j(cmds_local), to_j(segs_local),
    to_j(counted_local), jnp.asarray(np.asarray(info)),
    jnp.asarray(ramps_arr),
    None if atlas is None else jnp.asarray(atlas), jl, caps_l,
    interpret=True,
)
compact = np.asarray(compact)
tile2rank = np.asarray(tile2rank)
print("fflags", {k: bool(np.asarray(v)) for k, v in fflags.items()})

ref, _, _ = render_numpy_fn(scene, params, caps=dict(caps))
base = np.asarray(ld_np["base_color"], dtype=np.float32)
ba = max(float(base[3]), 1e-6)
base_un = np.array([base[0] / ba, base[1] / ba, base[2] / ba, base[3]],
                   dtype=np.float32)

wit = int(ld_np["width_in_tiles"])
worst = 0.0
for t in range(stripe_lo, min(stripe_hi, wit * int(ld_np["height_in_tiles"]))):
    tyy, txx = divmod(t, wit)
    rk = tile2rank[t]
    row = compact[rk] if rk >= 0 else base_un[:, None] * np.ones((4, 256), np.float32)
    timg = row.T.reshape(16, 16, 4)
    # un-premultiplied rgba vs ref
    rtile = ref[tyy * 16 : tyy * 16 + 16, txx * 16 : txx * 16 + 16]
    e = np.abs(timg - rtile).max()
    if e > 1e-3:
        print(f"tile {t} (tx={txx},ty={tyy}) rank={rk} err={e:.4f}")
    worst = max(worst, e)
print("stripe", d, "worst tile err", worst)

# ---- bisect: records + area rows, local vs global -------------------------
from jello_tpu.pipeline.coarse import classify_legacy_tiles
from jello_tpu.pipeline.coverage import compute_area_rows, rank_records
from jello_tpu.tpu.fine_pallas import build_records

def prep(cmds_in, counted_in, caps_in):
    xpj = jnp
    cm = to_j(cmds_in)
    cn = to_j(counted_in)
    lt_flag, d_excl, is_begin, is_end = classify_legacy_tiles(xpj, cm, caps_in)
    tile_j = cm["tile"].astype(jnp.int32)
    in_grid = tile_j < GRID
    legacy_flag = jnp.concatenate([lt_flag, jnp.zeros(1, jnp.int32)])
    rec_legacy = legacy_flag[jnp.clip(tile_j, 0, GRID)] > 0
    non_leg = (~rec_legacy) & in_grid
    in_group = non_leg & (is_begin | is_end | (d_excl >= 1))
    end_t = non_leg & is_end
    ident2 = in_group & ~is_end
    seg1_start = (~in_group) | is_begin
    seg1 = jnp.cumsum(seg1_start.astype(jnp.uint32))
    cm = dict(cm)
    cm["flags"] = (cm["flags"] | (rec_legacy.astype(jnp.uint32) << 1)
                   | (ident2.astype(jnp.uint32) << 4)
                   | (end_t.astype(jnp.uint32) << 5) | (seg1 << 8))
    capss = dict(caps_in)
    NRr, Wr = ramps_arr.shape[0], ramps_arr.shape[1]
    capss["max_stops"] = (Wr - 1) // 5
    area_blk, area_row_rec, ovf = compute_area_rows(jnp, cm, cn, capss)
    cm["area_row"] = area_row_rec
    rec = build_records(jnp, cm, jnp.asarray(scene_padded),
                        jnp.asarray(np.asarray(info)), capss)
    return (np.asarray(v) for v in (area_blk, area_row_rec, rec, cm["flags"]))

capsg = dict(caps)
capsg["_expand_interpret"] = True
capsg["_coverage_pallas"] = True
counted_g = dict(counted)
counted_g = {k: counted_g[k] for k in
             ("segs", "sorted_slot", "seg_count", "seg_start", "backdrop",
              "n_rows")}
ab_g, arr_g, rec_g, fl_g = prep(cmds, counted_g, capsg)
ab_l, arr_l, rec_l, fl_l = prep(cmds_local, counted_local, caps_l)

# Align: local record j corresponds to global record lo_d + j.
print("\nrecord comparison (local j -> global lo_d+j):")
for j in range(cnt_d):
    g = lo_d + j
    same_rec = np.array_equal(rec_l[j], rec_g[g])
    ar_l, ar_g2 = arr_l[j], arr_g[g]
    row_l = ab_l[ar_l] if ar_l >= 0 else None
    row_g = ab_g[ar_g2] if ar_g2 >= 0 else None
    if row_l is not None and row_g is not None:
        d_area = np.abs(row_l - row_g).max()
    else:
        d_area = float('nan') if (row_l is None) != (row_g is None) else 0.0
    print(f" j={j} rec_equal={same_rec} arow l/g={ar_l}/{ar_g2} "
          f"area_maxdiff={d_area:.6f}")
    if not same_rec:
        dif = np.nonzero(rec_l[j] != rec_g[g])[0]
        print("   rec fields differ at", dif, rec_l[j][dif], rec_g[g][dif])
