"""Device-side present path (tpu/render.py Renderer._get_present) vs
the host conversion (renderer/surface.py): the blit semantics of
engine/wgpu_engine/lib.go:109-198 — assembly, premultiply, sRGB OETF,
u8 quantization — must agree bit-for-bit (u8 values) with the host
reference on both fine-output layouts."""

import numpy as np

from jello_tpu.renderer.surface import to_rgba8


def _ld(wit, hit, w, h):
    return {
        "width_in_tiles": np.int32(wit),
        "height_in_tiles": np.int32(hit),
        "target_width": np.int32(w),
        "target_height": np.int32(h),
        "base_color": np.asarray([0.2, 0.4, 0.6, 1.0], np.float32),
    }


def _fake_renderer():
    from jello_tpu.tpu import Renderer

    return Renderer(use_pallas=False)


def test_present_dense_matches_host():
    import jax.numpy as jnp

    from jello_tpu.pipeline.fine_ref import assemble_image

    rng = np.random.default_rng(7)
    wit, hit = 3, 2
    ld = _ld(wit, hit, 42, 27)
    fine_out = rng.random((4, wit * hit + 2, 256), np.float32)

    r = _fake_renderer()
    present = r._get_present(ld, True, True, False)
    u8_dev = np.asarray(present(jnp.asarray(fine_out)))

    img = assemble_image(np, fine_out, ld)
    u8_host = to_rgba8(img, premul=True, srgb=True)
    # The sRGB pow differs by < 1e-6 between exp/log and **; allow one
    # quantization step on exact .5 boundaries.
    assert np.abs(u8_dev.astype(int) - u8_host.astype(int)).max() <= 1
    assert (u8_dev != u8_host).mean() < 0.01


def test_present_compact_matches_host():
    import jax.numpy as jnp

    from jello_tpu.tpu.fine_v2 import assemble_compact

    rng = np.random.default_rng(11)
    wit, hit = 4, 3
    ld = _ld(wit, hit, 64, 48)
    grid = wit * hit
    nt = 5
    compact = rng.random((grid + 8, 4, 256), np.float32)
    tile2rank = np.full(grid, -1, np.int32)
    occupied = rng.choice(grid, nt, replace=False)
    tile2rank[occupied] = np.arange(nt)

    r = _fake_renderer()
    present = r._get_present(ld, True, True, True)
    u8_dev = np.asarray(present(jnp.asarray(compact), jnp.asarray(tile2rank)))

    img = assemble_compact(np, compact, tile2rank, ld)
    u8_host = to_rgba8(img, premul=True, srgb=True)
    assert np.abs(u8_dev.astype(int) - u8_host.astype(int)).max() <= 1
    assert (u8_dev != u8_host).mean() < 0.01


def test_present_no_srgb_no_premul():
    import jax.numpy as jnp

    from jello_tpu.pipeline.fine_ref import assemble_image

    rng = np.random.default_rng(3)
    ld = _ld(2, 2, 32, 32)
    fine_out = rng.random((4, 4, 256), np.float32)
    r = _fake_renderer()
    present = r._get_present(ld, False, False, False)
    u8_dev = np.asarray(present(jnp.asarray(fine_out)))
    img = assemble_image(np, fine_out, ld)
    u8_host = to_rgba8(img, premul=False, srgb=False)
    assert np.array_equal(u8_dev, u8_host)


def test_render_surface_async_matches_blocking():
    """Frames-in-flight API (Renderer.render_surface_async /
    tpu.render.Frame — RenderToSurface's swapchain pipelining analog,
    lib.go:244-333): two async frames enqueued back-to-back fetch the
    same pixels as the blocking call, and the settled shape skips the
    flag fetch."""
    import jello_tpu as jt
    from jello_tpu.renderer.params import RenderParams

    scene = jt.Scene()
    path = (jt.BezPath().move_to(8, 8).line_to(56, 16)
            .cubic_to(60, 40, 30, 60, 10, 50).close())
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(0.8, 0.2, 0.1, 1.0)), None, path)
    params = RenderParams(width=64, height=64,
                          base_color=jt.Color.rgba(1, 1, 1, 1))

    r = _fake_renderer()
    blocking = r.render_surface(scene, params)
    # Two frames in flight before any fetch.
    f1 = r.render_surface_async(scene, params)
    f2 = r.render_surface_async(scene, params)
    out1 = f1.result()
    out2 = f2.result()
    assert np.array_equal(out1, blocking)
    assert np.array_equal(out2, blocking)
    assert f1.ready() and f2.ready()
    # The scene shape settled during the blocking render.
    assert r._est_key in r._settled
