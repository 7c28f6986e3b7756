"""Animation-sweep robustness: a scene whose geometry grows ~40%
across the calibration margin over a hundred frames must never leak an
overflow to the caller, must recompile only a bounded number of times,
and must not oscillate between capacity classes.

This exercises the full capacity protocol end to end (renderer/
estimate.py): host-side calibration on the first frame, the overflow-
grow retry when the sweep crosses the calibrated margin, and the
requirement that grown classes are persisted (growing back and forth
between two classes would recompile every frame — the failure mode
§5.3's retry protocol must not have)."""

import numpy as np
import pytest

import jello_tpu as jt
from jello_tpu.renderer.params import RenderParams


def _frame_scene(t: float, n_base: int = 24) -> jt.Scene:
    """A stroked-and-filled scene whose path/segment count grows with t
    (t in [0, 1] -> roughly +40% geometry) and whose coordinates move
    every frame (no two frames encode identical streams)."""
    rng = np.random.default_rng(12345)  # fixed layout, t-driven growth
    scene = jt.Scene()
    n = n_base + int(n_base * 0.4 * t)
    for i in range(n):
        cx, cy = rng.uniform(10, 210, 2)
        r = rng.uniform(4, 22)
        ph = 6.28318 * (t + i / n)
        x0, y0 = cx + r * np.cos(ph), cy + r * np.sin(ph)
        p = jt.BezPath().move_to(x0, y0)
        for k in range(1 + i % 3):
            a = ph + (k + 1) * 2.1
            p = p.cubic_to(
                cx + 2 * r * np.cos(a), cy + 2 * r * np.sin(a),
                cx + 2 * r * np.sin(a), cy - 2 * r * np.cos(a),
                cx + r * np.cos(a + 0.4), cy + r * np.sin(a + 0.4),
            )
        p = p.close()
        if i % 3 == 0:
            st = jt.Stroke(width=1.0 + (i % 5), join=jt.Join.ROUND,
                           start_cap=jt.Cap.ROUND, end_cap=jt.Cap.ROUND)
            scene.stroke(st, jt.Affine.identity(),
                         jt.SolidBrush(jt.Color.rgba(0.2, 0.5, 0.8, 0.9)),
                         None, p)
        else:
            scene.fill(jt.Fill.NON_ZERO, jt.Affine.identity(),
                       jt.SolidBrush(jt.Color.rgba(0.9, 0.3, 0.2, 0.8)),
                       None, p)
    return scene


@pytest.mark.slow
def test_animation_sweep_bounded_recompiles():
    from jello_tpu.tpu import Renderer

    params = RenderParams(width=224, height=224,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    r = Renderer()

    classes_seen = []
    for f in range(100):
        t = f / 99.0
        scene = _frame_scene(t)
        # Never raises = no overflow escaped the retry protocol.
        fine_out, ld = r.render_device(scene, params)
        key = tuple(sorted(
            (k, v) for k, v in r._caps.items() if isinstance(v, int)
        ))
        if not classes_seen or classes_seen[-1] != key:
            classes_seen.append(key)

    # Bounded compiles: the host calibration sizes frame 0 exactly; the
    # sweep's +40% growth may cross the margin a couple of times.
    assert len(r._compiled) <= 4, (
        f"{len(r._compiled)} compiled executables over the sweep"
    )
    # No oscillation: each class transition must be to a NEW class
    # (A->B->A would show A twice in the transition log).
    assert len(classes_seen) == len(set(classes_seen)), (
        "capacity class oscillated between compiled classes"
    )


@pytest.mark.slow
def test_animation_sweep_renders_correctly_at_ends():
    """Pixel spot-check at both ends of the sweep vs the numpy oracle
    (the retry/calibration machinery must not change pixels)."""
    from jello_tpu.cpu import render_numpy
    from jello_tpu.tpu import Renderer

    params = RenderParams(width=224, height=224,
                          base_color=jt.Color.rgba(1, 1, 1, 1))
    r = Renderer()
    for t in (0.0, 1.0):
        scene = _frame_scene(t)
        img = r.render(scene, params)
        ref, flags, _ = render_numpy(scene, params)
        assert not any(bool(v) for v in flags.values())
        assert np.abs(img - ref).max() < 2e-3
