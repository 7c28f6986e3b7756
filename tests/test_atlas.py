"""Shelf-packed image atlas (reference: resolve.go:128-149) — packing
invariants, mixed-size scenes, and a 512x512 image through the Pallas
fine path (interpret mode)."""

import numpy as np

import jello_tpu as jt
from jello_tpu.cpu import render_numpy
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver


def _img(rng, w, h):
    pix = (rng.random((h, w, 4)) * 255).astype(np.uint8)
    pix[..., 3] = 255
    return jt.Image(pixels=pix)


def test_shelf_packing_no_overlap():
    rng = np.random.default_rng(0)
    scene = jt.Scene()
    ident = jt.Affine.identity()
    sizes = [(8, 8), (100, 30), (17, 64), (250, 9), (64, 64), (3, 200)]
    for i, (w, h) in enumerate(sizes):
        img = _img(rng, w, h)
        sq = (jt.BezPath().move_to(10 * i, 0).line_to(10 * i + 8, 0)
              .line_to(10 * i + 8, 8).line_to(10 * i, 8).close())
        scene.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(img), None, sq)
    layout, ramps, atlas, scene_u32 = Resolver().resolve(scene.encoding)
    assert len(atlas) == len(sizes)
    assert atlas.width % 128 == 0 and atlas.height % 8 == 0
    # No two placements overlap.
    boxes = [
        (ax, ay, ax + img.width, ay + img.height)
        for img, (ax, ay) in zip(atlas.images, atlas.placements)
    ]
    for i in range(len(boxes)):
        x0, y0, x1, y1 = boxes[i]
        assert x1 <= atlas.width and y1 <= atlas.height
        for j in range(i):
            a, b = boxes[i], boxes[j]
            assert a[2] <= b[0] or b[2] <= a[0] or a[3] <= b[1] or b[3] <= a[1]
    # Packed area is tight-ish: no worse than 4x the pixel sum.
    from jello_tpu.cpu.pipeline import build_image_atlas

    plane = build_image_atlas(atlas)
    assert plane.shape == (atlas.height, atlas.width, 4)
    used = sum(w * h for w, h in sizes)
    # Loose sanity bound (shelf packing wastes space on extreme aspect
    # ratios, but must beat the old pad-everything-to-max scheme's
    # N * maxW * maxH).
    assert atlas.width * atlas.height <= max(8 * used, 128 * 64)
    assert atlas.width * atlas.height < len(sizes) * 250 * 200


def test_mixed_size_images_render():
    """Two different-size images + fills: oracle parity through the
    hybrid Pallas fine in interpret mode (region-DMA atlas taps)."""
    from tests.test_fine_hybrid import _run_hybrid

    rng = np.random.default_rng(1)
    scene = jt.Scene()
    ident = jt.Affine.identity()
    big = _img(rng, 70, 40)
    small = _img(rng, 9, 13)
    sq1 = jt.BezPath().move_to(10, 10).line_to(90, 10).line_to(90, 60).line_to(10, 60).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(big), None, sq1)
    sq2 = jt.BezPath().move_to(60, 70).line_to(80, 70).line_to(80, 100).line_to(60, 100).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(small), None, sq2)
    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_hybrid(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3


def test_512_image_renders_through_pallas_fine():
    """A 512x512 image (formerly past the whole-image VMEM limit)
    renders through the interpreter kernel via region DMA."""
    from tests.test_fine_hybrid import _run_hybrid

    rng = np.random.default_rng(2)
    image = _img(rng, 512, 512)
    scene = jt.Scene()
    ident = jt.Affine.identity()
    sq = jt.BezPath().move_to(0, 0).line_to(128, 0).line_to(128, 128).line_to(0, 128).close()
    scene.fill(jt.Fill.NON_ZERO, ident, jt.ImageBrush(image), None, sq)
    params = RenderParams(width=128, height=128,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    ref, flags, caps = render_numpy(scene, params)
    assert not any(bool(v) for v in flags.values())
    img = _run_hybrid(scene, params, caps)
    assert np.abs(img - ref).max() < 8e-3
