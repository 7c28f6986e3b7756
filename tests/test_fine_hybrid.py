"""Hybrid fine pass (record-stream kernel + legacy-tile interpreter) in
interpret mode vs the numpy reference fine — the UseCPU cross-check for
the production routing of frames with clips and images."""

import functools

import jax.numpy as jnp
import numpy as np

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.cpu.pipeline import build_image_atlas, build_layout_dict
from jello_tpu.pipeline import render as render_mod
from jello_tpu.pipeline.gradient import stops_table_or_empty
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver


def _run_hybrid(scene, params, caps):
    from jello_tpu.tpu.fine_hybrid import fine_hybrid
    from jello_tpu.tpu.fine_v2 import assemble_compact

    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    atlas = build_image_atlas(images)
    ramps_arr = stops_table_or_empty(ramps)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32

    fine_impl = functools.partial(fine_hybrid, interpret=True)
    out, flags = render_mod.render_frame(
        jnp,
        jnp.asarray(sp),
        {k: jnp.asarray(v) for k, v in ld.items()},
        jnp.asarray(ramps_arr),
        None if atlas is None else jnp.asarray(atlas),
        caps,
        fine_impl,
    )
    assert not any(bool(np.asarray(v)) for v in flags.values()), {
        k: np.asarray(v) for k, v in flags.items()
    }
    compact, tile2rank = out
    img = assemble_compact(np, np.asarray(compact), np.asarray(tile2rank), ld)
    return np.asarray(img)


def test_hybrid_matches_reference_full_scene():
    """Clips + blends + images + gradients: legacy tiles through the
    interpreter, the rest through the record-stream kernel."""
    from .test_full_scene import full_scene, PARAMS

    scene = full_scene()
    ref, flags, caps = render_numpy(scene, PARAMS)
    assert not any(bool(v) for v in flags.values())
    img = _run_hybrid(scene, PARAMS, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_hybrid_image_only_tiles():
    """An image draw over solid fills: only the image's tiles take the
    interpreter path; pixels elsewhere come from the record stream."""
    rng = np.random.default_rng(7)
    pix = (rng.random((8, 8, 4)) * 255).astype(np.uint8)
    pix[..., 3] = 255
    image = jt.Image(pixels=pix)

    scene = jt.Scene()
    ident = jt.Affine.identity()
    full = jt.BezPath().move_to(0, 0).line_to(128, 0).line_to(128, 128).line_to(0, 128).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.SolidBrush(jt.Color.rgba(0.2, 0.4, 0.8, 1)), None, full)
    tri = jt.BezPath().move_to(10, 10).line_to(100, 30).line_to(40, 110).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.SolidBrush(jt.Color.rgba(0.9, 0.2, 0.1, 0.8)), None, tri)
    sq = jt.BezPath().move_to(60, 60).line_to(100, 60).line_to(100, 100).line_to(60, 100).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(image), None, sq)

    params = RenderParams(width=128, height=128, base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_hybrid(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_group_scan_pure_clips():
    """Depth-1 pure clip groups stay on the record-stream kernel (no
    legacy tiles): overlapping members under a fractional-coverage clip
    edge must match the oracle's blend stack exactly (the two-level
    affine scan is exact, not the coverage-modulation approximation)."""
    IDENT = jt.Affine.identity()
    CLIP = jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER)

    def rect(x0, y0, x1, y1):
        return (jt.BezPath().move_to(x0, y0).line_to(x1, y0)
                .line_to(x1, y1).line_to(x0, y1).close())

    scene = jt.Scene()
    # Clip edge cuts through pixel interiors (fractional coverage).
    scene.push_layer(CLIP, 1.0, IDENT, rect(20.3, 20.7, 100.6, 100.2))
    # Two OVERLAPPING translucent members: group product != member
    # products under modulated coverage; only the exact formulation
    # matches the oracle at the clip edge.
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 0.6)), None,
               rect(10, 10, 80, 80))
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0, 0, 1, 0.5)), None,
               rect(15, 15, 90, 90))
    scene.pop_layer()
    # A plain fill after the group (pass-2 composition order).
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0, 1, 0, 0.4)), None,
               rect(60, 60, 120, 120))

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    # No legacy tiles: the whole frame must ride the record-stream path.
    from jello_tpu.pipeline.coarse import classify_legacy_tiles
    img = _run_hybrid(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_group_scan_chunk_boundary():
    """A clip group spanning a record-stream chunk boundary exercises
    the pass-1 carry (tiny v2_chunk forces multiple chunks)."""
    IDENT = jt.Affine.identity()
    CLIP = jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER)

    def rect(x0, y0, x1, y1):
        return (jt.BezPath().move_to(x0, y0).line_to(x1, y0)
                .line_to(x1, y1).line_to(x0, y1).close())

    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0.2, 0.2, 0.2, 1)), None,
               rect(0, 0, 64, 64))
    scene.push_layer(CLIP, 1.0, IDENT, rect(5.4, 5.6, 58.5, 58.4))
    for k in range(6):
        c = jt.Color.rgba(0.1 * k, 1 - 0.1 * k, 0.3, 0.5)
        scene.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(c), None,
                   rect(2 + 3 * k, 2 + 2 * k, 40 + 3 * k, 40 + 2 * k))
    scene.pop_layer()

    params = RenderParams(width=64, height=64,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    caps = dict(caps, v2_chunk=8)  # force chunk boundaries inside the group
    img = _run_hybrid(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_group_scan_alpha_groups():
    """Src-over groups with alpha != 1 (Mix.NORMAL and Mix.CLIP) are
    affine in the background and ride the record-stream kernel: the
    group transform scales covc by alpha. The group rect spans many
    tiles, so interior tiles exercise the ROW-LESS EndClip (full
    coverage resolved from the backdrop word) and edge tiles the
    fractional-coverage path. Asserts zero legacy tiles."""
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.renderer.resolve import Resolver

    IDENT = jt.Affine.identity()

    def rect(x0, y0, x1, y1):
        return (jt.BezPath().move_to(x0, y0).line_to(x1, y0)
                .line_to(x1, y1).line_to(x0, y1).close())

    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0.2, 0.5, 0.9, 1)), None,
               rect(0, 0, 128, 128))
    NORMAL = jt.BlendMode(jt.Mix.NORMAL, jt.Compose.SRC_OVER)
    scene.push_layer(NORMAL, 0.6, IDENT, rect(8.4, 8.6, 120.3, 120.7))
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(1, 0, 0, 0.7)), None,
               rect(4, 4, 100, 100))
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0, 1, 0, 0.5)), None,
               rect(20, 20, 110, 110))
    scene.pop_layer()
    CLIP = jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER)
    scene.push_layer(CLIP, 0.35, IDENT, rect(40.2, 40.8, 90.5, 90.1))
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0.1, 0.1, 0.1, 0.9)), None,
               rect(30, 30, 95, 95))
    scene.pop_layer()
    # Zero-coverage alpha group: clip path entirely off to the side of
    # its content -> identity.
    scene.push_layer(NORMAL, 0.5, IDENT, rect(200, 200, 220, 220))
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(1, 1, 0, 1)), None,
               rect(0, 0, 64, 64))
    scene.pop_layer()

    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())

    # Zero legacy tiles: everything rides the record stream.
    layout, ramps, images_, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, params)
    n = 1 << (max(len(scene_u32), 1024) - 1).bit_length()
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    _, _, stats = render_mod.render_frame(
        np, sp, ld, np.zeros((1, 11), np.float32), None, dict(caps),
        stats_only=True,
    )
    assert int(stats["legacy_tiles"]) == 0

    img = _run_hybrid(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_group_scan_alpha_group_chunk_boundary():
    """Alpha group spanning record-stream chunk boundaries (tiny
    v2_chunk): pass-1 carry with alpha-modulated end transform."""
    IDENT = jt.Affine.identity()
    NORMAL = jt.BlendMode(jt.Mix.NORMAL, jt.Compose.SRC_OVER)

    def rect(x0, y0, x1, y1):
        return (jt.BezPath().move_to(x0, y0).line_to(x1, y0)
                .line_to(x1, y1).line_to(x0, y1).close())

    scene = jt.Scene()
    scene.fill(jt.Fill.NON_ZERO, IDENT,
               jt.SolidBrush(jt.Color.rgba(0.3, 0.3, 0.3, 1)), None,
               rect(0, 0, 64, 64))
    scene.push_layer(NORMAL, 0.7, IDENT, rect(5.4, 5.6, 58.5, 58.4))
    for k in range(6):
        c = jt.Color.rgba(0.15 * k, 1 - 0.15 * k, 0.4, 0.5)
        scene.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(c), None,
                   rect(2 + 3 * k, 2 + 2 * k, 40 + 3 * k, 40 + 2 * k))
    scene.pop_layer()

    params = RenderParams(width=64, height=64,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_hybrid(scene, params, dict(caps, v2_chunk=8))
    assert np.abs(img - ref).max() < 8e-3
