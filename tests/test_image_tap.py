"""Image-tap kernel (tpu/image_tap.py): image paints through the
record-stream fine kernel. Interpret-mode cross-check vs the numpy
oracle — the UseCPU discipline (wgpu.go:454-513) for the tap routing.
"""

import numpy as np
import pytest

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.renderer.params import RenderParams

pytestmark = pytest.mark.slow


def _image(seed=7, size=8, alpha=None):
    rng = np.random.default_rng(seed)
    pix = (rng.random((size, size, 4)) * 255).astype(np.uint8)
    pix[..., 3] = 255 if alpha is None else alpha
    return jt.Image(pixels=pix)


def _rect(x0, y0, x1, y1):
    return (jt.BezPath().move_to(x0, y0).line_to(x1, y0)
            .line_to(x1, y1).line_to(x0, y1).close())


def _run_tap(scene, params, caps):
    from .test_fine_hybrid import _run_hybrid

    return _run_hybrid(scene, params, dict(caps, _image_tap=True))


def test_image_tiles_ride_record_stream():
    """With the tap on, an image-only scene classifies ZERO legacy
    tiles and still matches the oracle (coverage edge included)."""
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline.coarse import classify_legacy_tiles
    from jello_tpu.renderer.resolve import Resolver

    ident = jt.Affine.identity()
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(0.2, 0.4, 0.8, 1)), None,
               _rect(0, 0, 128, 128))
    # Diagonal edges -> fractional coverage on the image fill.
    tri = (jt.BezPath().move_to(20.5, 15.2).line_to(110.7, 40.3)
           .line_to(50.1, 120.6).close())
    scene.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(_image()), None, tri)

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())

    # Classification check on the host pipeline's command stream.
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    caps_t = dict(caps, _image_tap=True)
    _, _, stats = render_mod.render_frame(
        np, sp, ld, np.zeros((1, 11), np.float32), None, caps_t,
        stats_only=True,
    )
    assert int(stats["legacy_tiles"]) == 0
    assert int(stats["img_recs"]) > 0

    img = _run_tap(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_image_translucent_and_transformed():
    """Translucent image under a rotate+scale transform: bilinear taps,
    premultiply-per-tap order, in-bounds mask."""
    ident = jt.Affine.identity()
    xf = (jt.Affine.translate(40, 30) @ jt.Affine.rotate(0.35)
          @ jt.Affine.scale(2.5))
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(0.9, 0.9, 0.2, 1)), None,
               _rect(0, 0, 128, 128))
    scene.fill(jt.Fill.NON_ZERO, xf,
               jt.ImageBrush(_image(seed=3, alpha=140)), None,
               _rect(0, 0, 8, 8))

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_tap(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_image_inside_clip_group():
    """An image member of a depth-1 pure clip group: the tap's fg feeds
    the pass-1 group product; the tile must NOT go legacy."""
    ident = jt.Affine.identity()
    CLIP = jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER)
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(0.1, 0.5, 0.3, 1)), None,
               _rect(0, 0, 128, 128))
    scene.push_layer(CLIP, 1.0, ident, _rect(20.4, 20.6, 100.3, 100.7))
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 0.6)), None,
               _rect(10, 10, 90, 90))
    scene.fill(jt.Fill.NON_ZERO,
               jt.Affine.translate(30, 30) @ jt.Affine.scale(8.0),
               jt.ImageBrush(_image(seed=11, alpha=200)), None,
               _rect(0, 0, 8, 8))
    scene.pop_layer()

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_tap(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_full_scene_with_tap():
    """The all-feature scene (clips + blends + images + gradients) with
    the tap on: blend tiles stay on the interpreter, image-only tiles
    move to the record stream, pixels match the oracle either way."""
    from .test_full_scene import PARAMS, full_scene

    scene = full_scene()
    ref, flags, caps = render_numpy(scene, PARAMS)
    assert not any(bool(v) for v in flags.values())
    img = _run_tap(scene, PARAMS, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_tap_chunk_boundary():
    """Many small image draws force image records across record-stream
    chunk boundaries (tiny v2_chunk): the per-chunk fg-window base and
    rank alignment must hold."""
    ident = jt.Affine.identity()
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(0.3, 0.3, 0.3, 1)), None,
               _rect(0, 0, 128, 64))
    for k in range(10):
        xf = jt.Affine.translate(4 + 12 * k, 8 + (k % 3) * 14)
        scene.fill(jt.Fill.NON_ZERO, xf,
                   jt.ImageBrush(_image(seed=20 + k, alpha=220)), None,
                   _rect(0, 0, 8, 8))

    params = RenderParams(width=128, height=64,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_tap(scene, params, dict(caps, v2_chunk=8))
    assert np.abs(img - ref).max() < 8e-3


@pytest.mark.fast_guard
def test_image_tap_fast_guard():
    """FAST-SUITE guard: the tap is the production default routing for
    image paints (JELLO_IMAGE_TAP), so the fast suite must exercise it
    (the round-3 fine_v2 regression hid behind the slow marker)."""
    ident = jt.Affine.identity()
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(0.2, 0.6, 0.4, 1)), None,
               _rect(0, 0, 64, 64))
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.translate(12, 9) @ jt.Affine.scale(4),
               jt.ImageBrush(_image(seed=5, alpha=210)), None,
               _rect(0, 0, 8, 8))
    params = RenderParams(width=64, height=64,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_tap(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


@pytest.mark.fast_guard
def test_image_tap_minified_multiwindow():
    """Minified images (scale < ~1/4) sweep multiple atlas sub-windows
    instead of rerouting the frame to the XLA fine (VERDICT r4 item
    #10): a 64x64 source drawn at 1/8 scale maps each 16-px tile to a
    ~128-texel region — 2-6 windows. The window-relative one-hot
    accumulation must be EXACTLY the single bilinear tap, and the
    region-overflow flag must stay clear."""
    ident = jt.Affine.identity()
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(1, 1, 0.9, 1)), None,
               _rect(0, 0, 64, 64))
    # 1/8 scale: u-coords advance 8 source texels per pixel.
    scene.fill(jt.Fill.NON_ZERO,
               jt.Affine.translate(8, 6) @ jt.Affine.scale(1.0 / 8.0),
               jt.ImageBrush(_image(seed=9, size=64, alpha=230)), None,
               _rect(0, 0, 64, 64))
    params = RenderParams(width=64, height=64,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_tap(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_image_tap_msaa8():
    """Image paints through the tap under MSAA8: resolved coverage rows
    from the MSAA coverage kernel modulate the tapped fg. The scene is
    chosen to DISCRIMINATE msaa8 from area semantics (a dark image
    scaled over a diagonal-edged triangle: the oracle's msaa8 and area
    renders differ by ~0.15 at the edges)."""
    from jello_tpu.renderer.params import AaConfig

    pix = np.full((8, 8, 4), 255, np.uint8)
    pix[..., :3] = 20
    s = 1.0 / 16.0
    tri = (jt.BezPath().move_to(18.5 * s, 12.2 * s)
           .line_to(112.7 * s, 44.3 * s).line_to(52.1 * s, 118.6 * s)
           .close())
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.scale(16),
               jt.ImageBrush(jt.Image(pixels=pix)), None, tri)

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1),
                          antialiasing_method=AaConfig.MSAA8)
    params_area = RenderParams(width=128, height=128,
                               base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    ref_area, _, _ = render_numpy(scene, params_area)
    assert np.abs(ref - ref_area).max() > 0.05  # scene discriminates
    # MSAA on the Pallas fine path always rides the resolving coverage
    # kernel (tpu/render.py routing) — without it the raw-winding rows
    # would silently degrade to area semantics here.
    from .test_fine_hybrid import _run_hybrid

    img = _run_hybrid(
        scene, params,
        dict(caps, _image_tap=True, _coverage_pallas=True,
             _expand_interpret=True),
    )
    assert np.abs(img - ref).max() < 8e-3


def test_standalone_v2_with_tap_clip_free():
    """Clip-free frame with images through STANDALONE fine_v2 (the
    production _fine_mode="v2" routing: no hybrid classification, no
    interpreter pass — the config5 shape)."""
    import functools

    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    from jello_tpu.renderer.resolve import Resolver
    from jello_tpu.tpu.fine_v2 import assemble_compact, fine_v2

    ident = jt.Affine.identity()
    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, ident,
               jt.SolidBrush(jt.Color.rgba(0.15, 0.45, 0.75, 1)), None,
               _rect(0, 0, 128, 128))
    tri = (jt.BezPath().move_to(14.5, 10.2).line_to(116.7, 42.3)
           .line_to(54.1, 120.6).close())
    scene.fill(jt.Fill.NON_ZERO,
               jt.Affine.translate(10, 5) @ jt.Affine.scale(14),
               jt.ImageBrush(_image(seed=13, alpha=220)), None,
               (jt.BezPath().move_to(0.3, 0.4).line_to(7.6, 2.7)
                .line_to(3.1, 8.2).close()))
    scene.fill(jt.Fill.EVEN_ODD, ident,
               jt.SolidBrush(jt.Color.rgba(0.9, 0.3, 0.2, 0.6)), None, tri)

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    assert layout.n_clips == 0
    ld = build_layout_dict(layout, params)
    atlas = build_image_atlas(images)
    assert atlas is not None
    ramps_arr = stops_table_or_empty(ramps)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    fine_impl = functools.partial(fine_v2, interpret=True)
    out, fflags = render_mod.render_frame(
        jnp, jnp.asarray(sp),
        {k: jnp.asarray(v) for k, v in ld.items()},
        jnp.asarray(ramps_arr), jnp.asarray(atlas),
        dict(caps, _image_tap=True), fine_impl,
    )
    assert not any(bool(np.asarray(v)) for v in fflags.values()), {
        k: np.asarray(v) for k, v in fflags.items()
    }
    compact, tile2rank = out
    img = assemble_compact(np, np.asarray(compact), np.asarray(tile2rank), ld)
    assert np.abs(np.asarray(img) - ref).max() < 8e-3
