"""Where does the warmup compile time go?

Times jit lowering (host-side tracing → StableHLO) and backend
compilation for the config5 frame program under different kernel
routings. On the axon-tunneled TPU the compile runs server-side and is
not captured by the persistent compilation cache (measured: no cache
entry is written after a fresh compile), so compile time is a
first-class per-scene-shape cost and this probe is how we attribute it.

Usage: python tools/compile_probe.py [--config N] [--variant all|full|
       no_lockstep|no_pallas]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=5)
    ap.add_argument("--variant", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.renderer.estimate import estimate_caps_from_scene
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu.render import Renderer, _pow2

    scene, params = CONFIGS[args.config]()
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld_np = build_layout_dict(layout, params)
    n = _pow2(max(len(scene_u32), 1024))
    scene_padded = np.zeros(n, dtype=np.uint32)
    scene_padded[: len(scene_u32)] = scene_u32

    r = Renderer()
    host_caps = estimate_caps_from_scene(
        scene_u32, layout, params.width, params.height, None, floors=False
    )
    t0 = time.perf_counter()
    caps = r._host_calibrate(scene_padded, ld_np, host_caps,
                             params.antialiasing_method.value)
    print(f"host_calibrate: {time.perf_counter() - t0:.1f}s", flush=True)
    caps["aa_mode"] = params.antialiasing_method.value

    variants = {
        "full": {"_expand_pallas": True, "_coverage_pallas": True},
        "no_lockstep": {"_expand_pallas": True, "_coverage_pallas": True,
                        "_no_lockstep_pallas": True},
        "no_pallas": {},
    }
    if args.variant != "all":
        variants = {args.variant: variants[args.variant]}

    scene_dev = jnp.asarray(scene_padded)
    packed_layout = jnp.asarray(render_mod.pack_layout(ld_np))
    empty_ramps = jnp.zeros((1, 11), dtype=jnp.float32)

    for name, routing in variants.items():
        vcaps = dict(caps)
        vcaps.update(routing)
        if layout.n_clips == 0 and routing.get("_expand_pallas"):
            vcaps["_fine_mode"] = "v2"
        use_pallas = bool(routing)
        r2 = Renderer(use_pallas=use_pallas)

        def body(s, l, rr):
            lay = render_mod.unpack_layout(jnp, l)
            out, flags, stats = render_mod.render_frame(
                jnp, s, lay, rr, None, vcaps,
                r2._fine_impl(vcaps), with_stats=True)
            return out
        t0 = time.perf_counter()
        lowered = jax.jit(body).lower(scene_dev, packed_layout, empty_ramps)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        # Force the server-side compile to completion with one fetch.
        t0 = time.perf_counter()
        out = compiled(scene_dev, packed_layout, empty_ramps)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        t_exec = time.perf_counter() - t0
        print(f"{name}: lower={t_lower:.1f}s compile={t_compile:.1f}s "
              f"first_exec_fetch={t_exec:.1f}s", flush=True)


if __name__ == "__main__":
    main()
