"""A/B the flatten geometry megakernel vs the split XLA path on chip.

Times ONLY flatten_stage (fetch-forced warmup, content-varied layout
per call — tools/profile_flatten.py methodology) under three cap
routings: split (production default), geom (fused slot-geometry +
walks), geom+decode (scene decode fused too). Three small compiles
instead of profile_stages' full-frame cut executables.

Usage: python tools/ab_geom.py [--config N] [--reps N]
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="split,geom,geom_decode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline import flatten as fm
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu import Renderer
    from jello_tpu.tpu.render import _pow2

    scene, params = CONFIGS[args.config]()
    r = Renderer()
    r.render_device(scene, params)
    base_caps = dict(r._caps)
    if r.use_pallas:
        base_caps["_expand_pallas"] = True

    res = Resolver()
    layout, ramps, images, scene_u32 = res.resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    n = _pow2(max(len(scene_u32), 1024))
    scene_padded = np.zeros(n, dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32
    scene_dev = jnp.asarray(scene_padded)
    base = render_mod.pack_layout(ld_np)
    ctr = itertools.count(1)

    def fresh_layout():
        b = base.copy()
        c = np.float32(1.0 - next(ctr) * 1e-6)
        b[-4:] = np.asarray([c, c, c, np.float32(1.0)],
                            np.float32).view(np.uint32)
        return jnp.asarray(b)

    def body_for(caps):
        def body(scene, layout_packed):
            xp = jnp
            layout = render_mod.unpack_layout(xp, layout_packed)
            fl = fm.flatten_stage(xp, scene, layout, caps)
            return (fl["line_x0"].sum() + fl["line_y1"].sum()
                    + fl["path_bbox"].sum() + fl["n_lines"]
                    + fl["line_path"].sum() + fl["line_valid"].sum())
        return body

    for name in args.variants.split(","):
        caps = dict(base_caps)
        if name in ("geom", "geom_decode"):
            caps["_geom_pallas"] = True
        if name == "geom_decode":
            caps["_geom_decode"] = True
        fn = jax.jit(body_for(caps))
        t0 = time.time()
        out = fn(scene_dev, fresh_layout())
        val = np.asarray(out)
        compile_s = time.time() - t0
        best = 1e9
        for _trial in range(3):
            ls = [fresh_layout() for _ in range(args.reps)]
            jax.block_until_ready(ls)
            t0 = time.time()
            outs = [fn(scene_dev, l) for l in ls]
            jax.block_until_ready(outs)
            best = min(best, (time.time() - t0) / args.reps)
        print(f"{name:12s} {best * 1000:8.1f} ms   (compile {compile_s:.0f}s, "
              f"checksum {float(val):.6g})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
