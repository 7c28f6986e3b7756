"""Comprehensive scene: all brush types + nested clips/blends + dashes
in one frame (the scene used for device parity validation), plus the
overflow-retry protocol."""

import numpy as np

import jello_tpu as jt
from jello_tpu.curve import circle
from jello_tpu.cpu import render_numpy
from jello_tpu.renderer.params import RenderParams


def full_scene():
    s = jt.Scene()
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(1, 1, 0, 1)),
        jt.ColorStop(0.5, jt.Color.rgba(1, 0, 1, 1)),
        jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)),
    )
    FULL = jt.BezPath().move_to(0, 0).line_to(256, 0).line_to(256, 256).line_to(0, 256).close()
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
           jt.GradientBrush(jt.LinearGradient((0, 0), (256, 0), stops)), None, FULL)
    s.fill(jt.Fill.EVEN_ODD, jt.Affine.identity(),
           jt.GradientBrush(jt.RadialGradient((100, 100), 5.0, (120, 110), 80.0, stops, jt.Extend.REFLECT)),
           None, circle(110, 105, 70))
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
           jt.GradientBrush(jt.SweepGradient((180, 180), 0.0, 6.283185, stops)),
           None, circle(180, 180, 50))
    pix = np.zeros((4, 4, 4), np.uint8)
    pix[:2, :2] = [255, 0, 0, 255]
    pix[2:, 2:] = [0, 255, 0, 255]
    pix[:2, 2:] = [0, 0, 255, 255]
    pix[2:, :2] = [255, 255, 0, 128]
    s.fill(jt.Fill.NON_ZERO, jt.Affine.translate(10, 180) @ jt.Affine.scale(12),
           jt.ImageBrush(jt.Image(pixels=pix)), None,
           jt.BezPath().move_to(0, 0).line_to(4, 0).line_to(4, 4).line_to(0, 4).close())
    s.push_layer(jt.BlendMode(jt.Mix.MULTIPLY, jt.Compose.SRC_OVER), 0.8,
                 jt.Affine.identity(), circle(128, 128, 100))
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
           jt.SolidBrush(jt.Color.rgba(0.2, 0.9, 0.4, 0.7)), None, circle(120, 120, 60))
    s.push_layer(jt.BlendMode(jt.Mix.CLIP, jt.Compose.SRC_OVER), 1.0,
                 jt.Affine.identity(), circle(140, 140, 40))
    s.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
           jt.SolidBrush(jt.Color.rgba(0.9, 0.1, 0.1, 1)), None, FULL)
    s.pop_layer()
    s.pop_layer()
    s.stroke(jt.Stroke(width=5, dash_pattern=(12, 6)).with_caps(jt.Cap.ROUND),
             jt.Affine.identity(), jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1)), None,
             jt.BezPath().move_to(10, 30).cubic_to(80, 5, 170, 60, 246, 25))
    return s


PARAMS = RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1))


def test_full_scene_renders():
    img, flags, caps = render_numpy(full_scene(), PARAMS)
    assert not any(bool(v) for v in flags.values())
    assert img.shape == (256, 256, 4)
    # spot checks: sweep circle center region has paint, image quadrant red
    assert img[180 + 10, 180, 3] == 1.0
    assert img[186, 16, 0] > 0.8  # red image texel region


def test_overflow_retry_recovers():
    """Force tiny capacities: the retry protocol must converge to the
    same image as a correctly sized first attempt."""
    from jello_tpu.renderer.estimate import estimate_caps

    ref, flags, _ = render_numpy(full_scene(), PARAMS)
    tiny = estimate_caps(
        type("L", (), {"n_path_tags": 1, "n_paths": 1, "n_draw_objects": 1, "n_clips": 1})(),
        16, 16,
    )
    tiny.update(
        euler_line_cap=1 << 9, simple_line_cap=1 << 8, arc_line_cap=1 << 8,
        line_cap=1 << 10, seg_cap=1 << 10, row_cap=1 << 9, tiles_cap=1 << 8,
        pair_cap=1 << 8, area_rows_cap=1 << 8, tile_grid_cap=256,
        n_paths_cap=64, n_draws_cap=64, info_cap=1 << 9, n_tag_slots=1024,
        blend_depth=1, aa_mode="area",
    )
    img, flags, caps = render_numpy(full_scene(), PARAMS, caps=tiny, max_retries=12)
    assert not any(bool(v) for v in flags.values()), flags
    assert np.abs(img - ref).max() < 1e-4


def test_cmd_cap_live_prefix_slice():
    """cmd_cap < pair_cap slices the sorted command stream to the live
    prefix (coarse.build_commands): pixels must not change, and an
    undersized cmd_cap must raise pairs_overflow."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.pipeline.fine_ref import assemble_image
    from jello_tpu.renderer.estimate import estimate_caps_from_scene
    from jello_tpu.renderer.resolve import Resolver

    scene = full_scene()
    ref, _, _ = render_numpy(scene, PARAMS)
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    ld = build_layout_dict(layout, PARAMS)
    n = 1024
    while n < len(scene_u32):
        n <<= 1
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    caps = estimate_caps_from_scene(scene_u32, layout, 256, 256)
    caps["aa_mode"] = "area"
    with np.errstate(all="ignore"):
        _, _, st = render_mod.render_frame(
            np, sp, ld, np.zeros((1, 11), np.float32), None, caps,
            stats_only=True)
    nc = int(st["cmds"])
    assert nc > 0
    from jello_tpu.pipeline.gradient import stops_table_or_empty
    from jello_tpu.cpu.pipeline import build_image_atlas

    ramps_arr = stops_table_or_empty(ramps)
    atlas = build_image_atlas(images)
    caps2 = dict(caps, cmd_cap=nc + 3)  # non-aligned real slice
    out, fl, _ = render_mod.render_frame(
        jnp, jnp.asarray(sp), ld, jnp.asarray(ramps_arr),
        None if atlas is None else jnp.asarray(atlas), caps2,
        with_stats=True)
    assert not any(bool(np.asarray(v)) for v in fl.values()), fl
    img = np.asarray(assemble_image(np, np.asarray(out), ld))
    assert np.abs(img - ref).max() < 1e-4

    caps3 = dict(caps, cmd_cap=max(nc // 2, 1))
    _, fl3, _ = render_mod.render_frame(
        jnp, jnp.asarray(sp), ld, jnp.asarray(ramps_arr),
        None if atlas is None else jnp.asarray(atlas), caps3,
        with_stats=True)
    assert bool(np.asarray(fl3["pairs_overflow"]))


def test_coarse_dense_matches_general_clip_free():
    """Clip-free frames take the dense coarse branch (pair space ==
    slot space; coarse.build_commands `_coarse_dense`): the command
    stream must be IDENTICAL to the general pair-expansion branch."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import jello_tpu as jt
    from jello_tpu.cpu.pipeline import build_layout_dict
    from jello_tpu.pipeline import render as render_mod
    from jello_tpu.renderer.estimate import estimate_caps_from_scene
    from jello_tpu.renderer.resolve import Resolver

    scene = jt.Scene()
    stops = (jt.ColorStop(0.0, jt.Color.rgba(1, 0, 0, 1)),
             jt.ColorStop(1.0, jt.Color.rgba(0, 0, 1, 1)))
    scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
               jt.GradientBrush(jt.LinearGradient((0, 0), (200, 0), stops)),
               None,
               jt.BezPath().move_to(10, 10).cubic_to(90, 0, 150, 200, 240, 200)
               .line_to(10, 200).close())
    scene.fill(jt.Fill.EVEN_ODD, jt.Affine.identity(),
               jt.SolidBrush(jt.Color.rgba(0, 0.6, 0.2, 0.8)), None,
               jt.BezPath().move_to(60, 40).line_to(220, 60).line_to(120, 230)
               .close())
    scene.stroke(jt.Stroke(width=5), jt.Affine.identity(),
                 jt.SolidBrush(jt.Color.rgba(0, 0, 0, 1)), None,
                 jt.BezPath().move_to(20, 240).cubic_to(90, 150, 180, 150, 240, 230))
    layout, ramps, images, scene_u32 = Resolver().resolve(scene.encoding)
    assert layout.n_clips == 0
    ld = build_layout_dict(layout, PARAMS)
    n = 1024
    while n < len(scene_u32):
        n <<= 1
    sp = np.zeros(n, np.uint32)
    sp[: len(scene_u32)] = scene_u32
    caps = estimate_caps_from_scene(scene_u32, layout, 256, 256)
    caps["aa_mode"] = "area"
    # Equalize the pair/tile classes the way calibrated clip-free
    # frames have them (the dense guard requires it).
    caps["pair_cap"] = caps["tiles_cap"] = max(
        caps["pair_cap"], caps["tiles_cap"])
    from jello_tpu.pipeline.gradient import stops_table_or_empty

    ramps_arr = stops_table_or_empty(ramps)

    def run(dense):
        c = dict(caps)
        if dense:
            c["_coarse_dense"] = True
        out, fl, _ = render_mod.render_frame(
            jnp, jnp.asarray(sp), ld, jnp.asarray(ramps_arr), None, c,
            with_stats=True)
        assert not any(bool(np.asarray(v)) for v in fl.values()), fl
        return np.asarray(out)

    a = run(False)
    b = run(True)
    assert np.array_equal(a, b)
