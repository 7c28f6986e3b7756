"""Count top-level StableHLO ops in the production frame program.

The small-scene floor (config1 ~11 ms for one path at 256^2) is pure
per-op dispatch cost on the tunneled fabric; this counts what the
frame actually traces to, by op kind, so merging work targets the real
stragglers (VERDICT r4 item #5). Lowering happens entirely on host —
no TPU needed.

Usage: python tools/count_ops.py [--config N]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import functools

    import jax.numpy as jnp

    from jello_tpu.cpu import render_numpy
    from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.scenes import CONFIGS
    from jello_tpu.tpu.fine_hybrid import fine_hybrid
    from jello_tpu.tpu.fine_v2 import fine_v2

    scene, params = CONFIGS[args.config]()
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
    # Interpret mode keeps the same op structure around the kernels
    # (each still lowers to ONE call op) and lets the CPU backend lower.
    caps["_expand_interpret"] = True
    import functools as _ft

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
        lowered = jax.jit(lambda s, r: body(s, r, None)).lower(*argsl)
    else:
        lowered = jax.jit(body).lower(*argsl, jnp.asarray(atlas))
    txt = lowered.as_text()

    # Count ops in the MAIN function only (between func.func @main and
    # its closing brace at column 2) to avoid double-counting called
    # private functions... StableHLO from jax is typically flat.
    ops = collections.Counter()
    for m in re.finditer(r"=\s+\"?([a-z_]+\.[a-z_0-9]+)\"?[( ]", txt):
        ops[m.group(1)] += 1
    total = sum(ops.values())
    print(f"config{args.config}: {total} stablehlo ops "
          f"({len(txt) // 1024} KiB text)")
    for k, v in ops.most_common(args.top):
        print(f"  {k:32s} {v}")
    big = ("stablehlo.sort", "stablehlo.scatter", "stablehlo.gather",
           "stablehlo.custom_call", "stablehlo.while",
           "stablehlo.reduce_window", "stablehlo.dynamic_gather")
    print("heavy ops:", {k: ops.get(k, 0) for k in big})
    return 0


if __name__ == "__main__":
    sys.exit(main())
