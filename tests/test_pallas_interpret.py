"""The Pallas fine kernel in interpreter mode vs the reference fine —
the analog of the reference's UseCPU debug-shader cross-check
(SURVEY §4: interpret=True is the UseCPU of this build)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.cpu.pipeline import build_layout_dict
from jello_tpu.renderer.estimate import estimate_caps_from_scene
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver
from jello_tpu.pipeline import render as render_mod
from jello_tpu.pipeline.fine_ref import assemble_image


def test_pallas_interpret_matches_reference_fine():
    from .test_full_scene import full_scene, PARAMS
    from jello_tpu.tpu.fine_pallas import fine_pallas

    scene = full_scene()
    ref, flags, caps = render_numpy(scene, PARAMS)
    assert not any(bool(v) for v in flags.values())

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, PARAMS)
    from jello_tpu.cpu.pipeline import build_image_atlas

    atlas = build_image_atlas(images)
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    ramps_arr = stops_table_or_empty(ramps)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32

    fine_impl = functools.partial(fine_pallas, interpret=True)
    fine_out, out_flags = render_mod.render_frame(
        jnp,
        jnp.asarray(sp),
        {k: jnp.asarray(v) for k, v in ld.items()},
        jnp.asarray(ramps_arr),
        jnp.asarray(atlas),
        caps,
        fine_impl,
    )
    assert not any(bool(v) for v in out_flags.values())
    img = assemble_image(np, np.asarray(fine_out), ld)
    # Differences are coverage summation order + one-texel ramp index
    # rounding at exact boundaries (1/512): bounded well below 1%.
    assert np.abs(np.asarray(img) - ref).max() < 8e-3
