"""Compare geometry-sharded intermediates against the single-chip numpy
stages: seg_count, backdrop, command stream, stripe slices."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import jello_tpu as jt
from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
from jello_tpu.pipeline import render as render_mod
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.pipeline.render import pack_layout
from jello_tpu.renderer.estimate import estimate_caps
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.tpu import sharded2 as s2
from tools.debug_sharded2 import build_scene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
devices = np.array(jax.devices()[:n])
mesh = Mesh(devices, (s2.AXIS,))

scene = build_scene()
W = H = 128
params = RenderParams(width=W, height=H, base_color=jt.Color.rgba(1, 1, 1, 1))
layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
ld_np = build_layout_dict(layout, params)
caps = estimate_caps(layout, params.width, params.height)

nsc = 1 << (len(scene_u32) - 1).bit_length()
scene_padded = np.zeros(max(nsc, 1024), dtype=np.uint32)
scene_padded[: len(scene_u32)] = scene_u32
ramps_arr = stops_table_or_empty(ramps)
atlas = build_image_atlas(images)

run = s2.make_sharded_render(mesh, caps, interpret=True, debug=True)
out, flags, dbg = run(
    jnp.asarray(scene_padded), jnp.asarray(pack_layout(ld_np)),
    jnp.asarray(ramps_arr), None if atlas is None else jnp.asarray(atlas),
)
dbg = {k: np.asarray(v) for k, v in dbg.items()}

# ---- single-chip reference stages under numpy ---------------------------
xp = np
from jello_tpu.pipeline import clips as clips_mod
from jello_tpu.pipeline import coarse as coarse_mod
from jello_tpu.pipeline import drawobjs, tiling
from jello_tpu.pipeline import flatten as flatten_mod
from jello_tpu.pipeline.render import _draw_tags

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

T = caps["tiles_cap"]
ntv = int(np.asarray(paths["n_tiles"]))
print("n_tiles", ntv, "T", T)

sc_ref = np.asarray(counted["seg_count"])[:ntv]
sc_sh = dbg["seg_count"][:ntv]
print("seg_count match:", np.array_equal(sc_ref, sc_sh))
if not np.array_equal(sc_ref, sc_sh):
    bad = np.nonzero(sc_ref != sc_sh)[0]
    print(" bad slots", bad[:20], "ref", sc_ref[bad[:20]], "sh", sc_sh[bad[:20]])

bd_ref = np.asarray(counted["backdrop"])[:ntv]
bd_sh = dbg["backdrop"][:ntv]
print("backdrop match:", np.array_equal(bd_ref, bd_sh))
if not np.array_equal(bd_ref, bd_sh):
    bad = np.nonzero(bd_ref != bd_sh)[0]
    print(" bad slots", bad[:30], "\n ref", bd_ref[bad[:30]], "\n sh ", bd_sh[bad[:30]])
    tx = np.asarray(paths["tile_tx"])[:ntv]
    ty = np.asarray(paths["tile_ty"])[:ntv]
    print(" bad (tx,ty):", list(zip(tx[bad[:30]], ty[bad[:30]])))

ct_ref = np.asarray(cmds["tile"]).astype(np.int64)
ct_sh = dbg["cmd_tile"].astype(np.int64)
GRID = caps["tile_grid_cap"]
live_ref = ct_ref < GRID
live_sh = ct_sh < GRID
print("cmd live counts ref/sh:", live_ref.sum(), live_sh.sum())
m = min(len(ct_ref), len(ct_sh))
for k in ("cmd_tile", "cmd_kind", "cmd_seg_count", "cmd_backdrop"):
    r = np.asarray(cmds[k.replace("cmd_", "")])[:m]
    s = dbg[k][:m]
    eq = np.array_equal(np.where(live_ref[:m], r, -1), np.where(live_sh[:m], s, -1))
    print(k, "match:", eq)
    if not eq:
        bad = np.nonzero(np.where(live_ref[:m], r, -1) != np.where(live_sh[:m], s, -1))[0]
        print("  first bad", bad[:10], "ref", r[bad[:10]], "sh", s[bad[:10]])

print("lo_d", dbg["lo_d"], "cnt_d", dbg["cnt_d"])
print("ranks per device (first 8 each):")
local = GRID // n
for d in range(min(n, 8)):
    print(" d", d, dbg["ranks"][d][:8])

# ---- per-slot segment multiset comparison --------------------------------
ref_segs = counted["segs"]
ss = np.asarray(counted["seg_start"])
scnt = np.asarray(counted["seg_count"])
rows_ref = []
for slot in range(ntv):
    for j in range(scnt[slot]):
        k = ss[slot] + j
        rows_ref.append((slot, ref_segs["seg_x0"][k], ref_segs["seg_y0"][k],
                         ref_segs["seg_x1"][k], ref_segs["seg_y1"][k],
                         ref_segs["seg_y_edge"][k]))
rows_ref = np.array(sorted(rows_ref), dtype=np.float64)

rows_sh = []
for d in range(n):
    seg = dbg["segs_local"][d]
    for r in seg:
        if r[0] < T:
            rows_sh.append(tuple(r.astype(np.float64)))
rows_sh = np.array(sorted(rows_sh), dtype=np.float64)
print("ref segs", rows_ref.shape, "sh segs", rows_sh.shape)
if rows_ref.shape == rows_sh.shape:
    d = np.abs(rows_ref - rows_sh)
    print("max diff per col", d.max(axis=0))
    bad = np.nonzero(d.max(axis=1) > 1e-4)[0]
    for i in bad[:10]:
        print(" ref", rows_ref[i], "\n sh ", rows_sh[i])
else:
    import collections
    cr = collections.Counter(map(tuple, np.round(rows_ref, 4)))
    cs = collections.Counter(map(tuple, np.round(rows_sh, 4)))
    print("only in ref:", list((cr - cs).items())[:10])
    print("only in sh :", list((cs - cr).items())[:10])
