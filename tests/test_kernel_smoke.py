"""Fast interpret-mode smoke of every production Pallas kernel
(VERDICT r3 weak #6: the default suite must execute each kernel at
least once — round 3 shipped a fine_v2 compositing bug exactly because
its tests were all slow-marked).

One tiny clip+blend+gradient+stroke frame at 96x96 drives the FULL
production routing (lockstep + landing + expand + coverage +
fine_hybrid's record-stream and batched-interpreter kernels) under
interpret mode; the clip-free fine_v2 standalone routing is guarded by
test_v2_standalone_overlap_fast, and the image-tap kernel by
test_image_tap.py's fast_guard cases. Tiny capacities keep this under
~30 s. Kernel-coverage policy (VERDICT r4 item #7): every production
Pallas kernel executes at least once in the fast suite.
"""

import functools

import jax.numpy as jnp
import numpy as np

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
from jello_tpu.pipeline import render as render_mod
from jello_tpu.pipeline.fine_ref import assemble_image
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver


def _tiny_scene():
    s = jt.Scene()
    stops = (jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
             jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)))
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
           jt.GradientBrush(jt.LinearGradient((0, 0), (96, 0), stops)),
           None,
           jt.BezPath().move_to(4, 4).line_to(92, 8).line_to(50, 90).close())
    s.push_layer(jt.BlendMode(jt.Mix.MULTIPLY, jt.Compose.SRC_OVER), 0.8,
                 jt.Affine.identity(),
                 (jt.BezPath().move_to(20, 20).line_to(80, 24)
                  .line_to(76, 80).line_to(16, 76).close()))
    s.fill(jt.Fill.EVEN_ODD, jt.Affine.identity(),
           jt.SolidBrush(jt.Color.rgba(0.2, 0.9, 0.4, 0.7)), None,
           (jt.BezPath().move_to(10, 30).cubic_to(40, 0, 60, 90, 90, 40)
            .close()))
    s.pop_layer()
    s.stroke(jt.Stroke(width=3).with_caps(jt.Cap.ROUND),
             jt.Affine.identity(),
             jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1)), None,
             jt.BezPath().move_to(8, 88).line_to(88, 12))
    return s


def test_production_kernels_smoke_interpret():
    from jello_tpu.tpu.fine_hybrid import fine_hybrid

    params = RenderParams(width=96, height=96,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    scene = _tiny_scene()
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    atlas = build_image_atlas(images)
    ramps_arr = stops_table_or_empty(ramps)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32

    caps = dict(caps)
    # Production routing + the opt-in batched interpreter so it stays
    # covered by the fast suite while off by default (lost its on-chip
    # A/B).
    caps["_expand_pallas"] = True
    caps["_coverage_pallas"] = True
    caps["_expand_interpret"] = True
    caps["_interp_batch"] = True

    fine_impl = functools.partial(fine_hybrid, interpret=True)
    fine_out, out_flags = render_mod.render_frame(
        jnp,
        jnp.asarray(sp),
        {k: jnp.asarray(v) for k, v in ld.items()},
        jnp.asarray(ramps_arr),
        None if atlas is None else jnp.asarray(atlas),
        caps,
        fine_impl,
    )
    assert not any(bool(v) for v in out_flags.values()), out_flags
    if isinstance(fine_out, tuple):
        from jello_tpu.tpu.fine_v2 import assemble_compact

        compact, tile2rank = fine_out
        img = assemble_compact(np, np.asarray(compact),
                               np.asarray(tile2rank), ld)
    else:
        img = assemble_image(np, np.asarray(fine_out), ld)
    assert np.abs(np.asarray(img) - ref).max() < 8e-3
