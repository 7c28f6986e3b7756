"""Stage-by-stage debug of the geometry-sharded pipeline (sharded2).

Tests the sharded flatten WITHOUT shard_map: runs flatten_stage per
tag-range shard on one device with host-computed monoid bases, combines
per-path outputs like the sharded pipeline would, and compares against
the full single-shot flatten_stage.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import jello_tpu as jt
from jello_tpu.cpu.pipeline import build_layout_dict
from jello_tpu.pipeline import flatten as flatten_mod
from jello_tpu.pipeline import render as render_mod
from jello_tpu.renderer.estimate import estimate_caps
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.tpu.sharded2 import shard_caps


def build_scene(W=128, H=128):
    scene = jt.Scene()
    path = (jt.BezPath().move_to(5, 5).cubic_to(30, 2, 50, 60, W - 30, H - 50)
            .line_to(60, 10).close())
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(0, 0.7, 0.2, 1)), None, path)
    scene.stroke(
        jt.Stroke(width=3).with_caps(jt.Cap.ROUND), jt.Affine.identity(),
        jt.SolidBrush(jt.Color.rgba(0.8, 0.1, 0.1, 1)), None,
        jt.BezPath().move_to(10, H - 40).line_to(W - 10, H - 30),
    )
    return scene


def main():
    n = 2
    scene = build_scene()
    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    caps = estimate_caps(layout, params.width, params.height)
    caps_l = shard_caps(caps, n)
    print("caps n_tag_slots", caps["n_tag_slots"], "local", caps_l["n_tag_slots"])
    print("n_path_tags", ld_np["n_path_tags"])

    nsc = 1 << (len(scene_u32) - 1).bit_length()
    scene_padded = np.zeros(max(nsc, 1024), dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32
    sc = jnp.asarray(scene_padded)
    ld = {k: jnp.asarray(np.asarray(v)) for k, v in ld_np.items()}

    xp = jnp
    # Full single-shot flatten.
    full = flatten_mod.flatten_stage(xp, sc, ld, caps)

    # Sharded flatten: per-shard decode + host two-level scan bases.
    N_l = caps_l["n_tag_slots"]
    shards = []
    keys0 = flatten_mod.monoid_delta_totals(
        xp, flatten_mod.decode_tag_stream(xp, sc, ld["path_tag_base"], N_l)
    ).keys()
    base = {k: jnp.uint32(0) for k in keys0}
    bb_acc = None
    pdf = None
    pti = None
    lines_cat = {}
    for d in range(n):
        tag_lo = d * N_l
        tags_local = flatten_mod.decode_tag_stream(
            xp, sc, ld["path_tag_base"] + tag_lo // 4, N_l
        )
        totals = flatten_mod.monoid_delta_totals(xp, tags_local)
        fl = flatten_mod.flatten_stage(
            xp, sc, ld, caps_l,
            shard={"tag_lo": jnp.int32(tag_lo), "monoid_base": dict(base)},
        )
        shards.append(fl)
        for k in base:
            base[k] = base[k] + totals[k]
        bb_acc = fl["bb_acc"] if bb_acc is None else jnp.maximum(bb_acc, fl["bb_acc"])
        pdf = fl["path_draw_flags"] if pdf is None else pdf + fl["path_draw_flags"]
        pti = fl["path_trans_idx"] if pti is None else pti + fl["path_trans_idx"]

    path_bbox_sh = flatten_mod.finalize_path_bbox(xp, bb_acc)
    print("\n-- per-path bbox --")
    npaths = int(ld_np["n_paths"])
    print("full:\n", np.asarray(full["path_bbox"])[:npaths])
    print("shard:\n", np.asarray(path_bbox_sh)[:npaths])
    print("draw_flags full", np.asarray(full["path_draw_flags"])[:npaths],
          "shard", np.asarray(pdf)[:npaths])
    print("trans_idx full", np.asarray(full["path_trans_idx"])[:npaths],
          "shard", np.asarray(pti)[:npaths])

    # Line soup comparison: collect (path, x0,y0,x1,y1) multisets.
    def soup(fl):
        lp = np.asarray(fl["line_path"])
        ok = np.asarray(fl["line_valid"]).astype(bool)
        rows = np.stack(
            [lp.astype(np.float64)] +
            [np.asarray(fl[k], dtype=np.float64)
             for k in ("line_x0", "line_y0", "line_x1", "line_y1")], axis=1
        )[ok]
        order = np.lexsort(rows.T[::-1])
        return rows[order]

    s_full = soup(full)
    s_sh = np.concatenate([soup(fl) for fl in shards], axis=0)
    order = np.lexsort(s_sh.T[::-1])
    s_sh = s_sh[order]
    print("\nlines full", s_full.shape[0], "shard", s_sh.shape[0])
    if s_full.shape == s_sh.shape:
        d = np.abs(s_full - s_sh).max()
        print("line soup max diff", d)
    else:
        print("LINE COUNT MISMATCH")
        for i in range(min(20, max(s_full.shape[0], s_sh.shape[0]))):
            a = s_full[i] if i < len(s_full) else None
            b = s_sh[i] if i < len(s_sh) else None
            print(i, a, b)


if __name__ == "__main__":
    main()
