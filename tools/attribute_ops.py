"""Attribute heavy top-level StableHLO ops to pipeline stages and lines.

Round-5 scoreboard (VERDICT r4 item #1): the small-scene frame cost is
(number of unfusable random-access ops) x (~60-80 us/op fabric floor),
so collapsing the count IS the optimization. This lowers the production
frame with debug info and maps every heavy op (gather / scatter / sort /
while / reduce_window / custom_call) to its named_scope path and source
line, so merges target the real stragglers.

Usage: python tools/attribute_ops.py [--config N] [--kinds gather,scatter]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

HEAVY = (
    "stablehlo.sort",
    "stablehlo.scatter",
    "stablehlo.gather",
    "stablehlo.custom_call",
    "stablehlo.while",
    "stablehlo.reduce_window",
    "stablehlo.dynamic_gather",
)


def frame_fn(config: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import functools as _ft

    import jax.numpy as jnp

    from jello_tpu.cpu import render_numpy
    from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu.fine_hybrid import fine_hybrid
    from jello_tpu.tpu.fine_v2 import fine_v2

    scene, params = CONFIGS[config]()
    _, flags, caps = render_numpy(scene, params)
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    atlas = build_image_atlas(images)
    ramps_arr = stops_table_or_empty(ramps)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32

    caps = dict(caps)
    caps["_expand_pallas"] = True
    caps["_coverage_pallas"] = True
    caps["_expand_interpret"] = True

    base_fine = (fine_v2 if layout.n_clips == 0 and atlas is None
                 else fine_hybrid)
    fine_impl = _ft.partial(base_fine, interpret=True)

    def body(scene_b, ramps_b, images_b):
        return render_mod.render_frame(
            jnp, scene_b, {k: jnp.asarray(v) for k, v in ld.items()},
            ramps_b, images_b, caps, fine_impl,
        )

    argsl = [jnp.asarray(sp), jnp.asarray(ramps_arr)]
    if atlas is None:
        return (lambda s, r: body(s, r, None)), argsl
    return body, argsl + [jnp.asarray(atlas)]


# Jaxpr primitives that lower to the unfusable random-access HLO ops
# the fabric charges per-launch (BASELINE.md op tables). `cumsum` and
# friends lower to reduce_window.
HEAVY_PRIMS = (
    "gather", "scatter", "scatter-add", "scatter-max", "scatter-min",
    "scatter-mul", "sort", "while", "cumsum", "cummax", "cummin",
    "cumprod", "scan", "dynamic_gather",
)


def walk(jaxpr, rows, depth=0):
    import jax

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name not in HEAVY_PRIMS and name not in ("while", "scan"):
            # Inline wrappers (pjit, custom_jvp, remat...): their interior
            # ops lower into the caller.
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    inner = v.jaxpr if not hasattr(v.jaxpr, "jaxpr") else v.jaxpr.jaxpr
                    walk(inner, rows, depth)
            continue
        if name in HEAVY_PRIMS:
            stack = str(eqn.source_info.name_stack)
            frame = None
            try:
                from jax._src import source_info_util
                fr = None
                for cand in source_info_util.user_frames(
                        eqn.source_info.traceback):
                    fr = cand
                    if os.path.basename(cand.file_name) != "ops.py":
                        break
                frame = (f"{os.path.basename(fr.file_name)}:"
                         f"{fr.start_line}") if fr else "?"
            except Exception:
                frame = "?"
            # approximate row count: first operand leading dim
            try:
                shp = eqn.invars[0].aval.shape
                rowsz = shp[0] if shp else 0
            except Exception:
                rowsz = 0
            rows.append((name, stack, frame, rowsz))
        # Do NOT recurse into while/scan bodies: interior ops don't
        # launch separately.


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--by-line", action="store_true")
    args = ap.parse_args()

    import jax

    fn, argsl = frame_fn(args.config)
    jpr = jax.make_jaxpr(fn)(*argsl)
    rows = []
    walk(jpr.jaxpr, rows)

    total = len(rows)
    print(f"config{args.config}: {total} heavy top-level ops (jaxpr)")
    per_stage = collections.Counter()
    per_kind = collections.Counter()
    for name, stack, frame, rowsz in rows:
        stage = stack.split("/")[0] if stack else "?"
        per_stage[stage] += 1
        per_kind[name] += 1
    print("\nby kind:", dict(per_kind))
    print("\nby stage:")
    det = collections.Counter()
    for name, stack, frame, rowsz in rows:
        stage = stack.split("/")[0] if stack else "?"
        det[(stage, name)] += 1
    for s, n in per_stage.most_common():
        kinds = {k: v for (s2, k), v in det.items() if s2 == s}
        print(f"  {s:24s} {n:4d}  {kinds}")
    if args.by_line:
        print("\nby source line:")
        per_line = collections.Counter()
        rowsum = collections.Counter()
        for name, stack, frame, rowsz in rows:
            per_line[(frame, name)] += 1
            rowsum[(frame, name)] += rowsz
        for (frame, name), n in per_line.most_common(80):
            print(f"  {n:3d}  {name:12s} {frame:32s} rows~{rowsum[(frame, name)]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
