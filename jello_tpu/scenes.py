"""Procedural benchmark scenes for the five BASELINE.json configs.

The Ghostscript tiger asset is not available in this environment (no
network egress), so config 5 is a deterministic procedural scene with
the same structural profile: >10k paths mixing multi-segment cubic
fills, stroked outlines, gradients and image brushes at 1080p.
"""

from __future__ import annotations

import math

import numpy as np

import jello_tpu as jt
from .curve import circle
from .renderer.params import RenderParams

IDENT = jt.Affine.identity()


def _rng(seed=1234):
    return np.random.default_rng(seed)


def _blob(rng, cx, cy, r, n_segs=4):
    """A closed blob of n cubic segments around (cx, cy)."""
    p = jt.BezPath()
    angles = np.linspace(0, 2 * math.pi, n_segs, endpoint=False)
    radii = r * (0.6 + 0.8 * rng.random(n_segs))
    pts = [(cx + rr * math.cos(a), cy + rr * math.sin(a)) for a, rr in zip(angles, radii)]
    p.move_to(*pts[0])
    for i in range(n_segs):
        a, b = pts[i], pts[(i + 1) % n_segs]
        c1 = (a[0] + (b[0] - a[0]) / 3 + rng.normal(0, r * 0.2), a[1] + (b[1] - a[1]) / 3 + rng.normal(0, r * 0.2))
        c2 = (a[0] + 2 * (b[0] - a[0]) / 3 + rng.normal(0, r * 0.2), a[1] + 2 * (b[1] - a[1]) / 3 + rng.normal(0, r * 0.2))
        p.cubic_to(c1[0], c1[1], c2[0], c2[1], b[0], b[1])
    p.close()
    return p


def _solid(rng):
    return jt.SolidBrush(jt.Color.rgba(rng.random(), rng.random(), rng.random(), 0.3 + 0.7 * rng.random()))


def _gradient(rng, cx, cy, r, kind="linear"):
    stops = (
        jt.ColorStop(0.0, jt.Color.rgba(rng.random(), rng.random(), rng.random(), 1)),
        jt.ColorStop(0.5, jt.Color.rgba(rng.random(), rng.random(), rng.random(), 1)),
        jt.ColorStop(1.0, jt.Color.rgba(rng.random(), rng.random(), rng.random(), 1)),
    )
    if kind == "linear":
        return jt.GradientBrush(jt.LinearGradient((cx - r, cy), (cx + r, cy), stops))
    return jt.GradientBrush(jt.RadialGradient((cx, cy), 0.0, (cx, cy), r, stops))


def config1():
    """Single solid-fill cubic path @256x256."""
    scene = jt.Scene()
    path = jt.BezPath().move_to(30, 40).cubic_to(90, 10, 150, 220, 200, 240).line_to(180, 50).close()
    scene.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(0.8, 0.1, 0.2, 1)), None, path)
    return scene, RenderParams(width=256, height=256, base_color=jt.Color.rgba(1, 1, 1, 1))


def config2():
    """100 stroked paths with joins/caps/dashes @512x512."""
    rng = _rng(2)
    scene = jt.Scene()
    caps = [jt.Cap.BUTT, jt.Cap.SQUARE, jt.Cap.ROUND]
    joins = [jt.Join.BEVEL, jt.Join.MITER, jt.Join.ROUND]
    for i in range(100):
        x0, y0 = rng.random(2) * 512
        p = jt.BezPath().move_to(x0, y0)
        for _ in range(3):
            x1, y1, x2, y2, x3, y3 = rng.random(6) * 512
            p.cubic_to(x1, y1, x2, y2, x3, y3)
        dash = (10.0, 6.0) if i % 4 == 0 else ()
        st = jt.Stroke(
            width=1 + 6 * rng.random(),
            join=joins[i % 3],
            miter_limit=4.0,
            start_cap=caps[i % 3],
            end_cap=caps[(i + 1) % 3],
            dash_pattern=dash,
        )
        scene.stroke(st, IDENT, _solid(rng), None, p)
    return scene, RenderParams(width=512, height=512, base_color=jt.Color.rgba(1, 1, 1, 1))


def config3():
    """1k gradient-filled paths @1024x1024."""
    rng = _rng(3)
    scene = jt.Scene()
    for i in range(1000):
        cx, cy = rng.random(2) * 1024
        r = 10 + 40 * rng.random()
        path = _blob(rng, cx, cy, r)
        kind = "linear" if i % 2 == 0 else "radial"
        scene.fill(jt.Fill.NON_ZERO, IDENT, _gradient(rng, cx, cy, r, kind), None, path)
    return scene, RenderParams(width=1024, height=1024, base_color=jt.Color.rgba(1, 1, 1, 1))


def config4():
    """Nested clip stack + mix/compose blend modes @1080p."""
    rng = _rng(4)
    scene = jt.Scene()
    mixes = [jt.Mix.NORMAL, jt.Mix.MULTIPLY, jt.Mix.SCREEN, jt.Mix.OVERLAY,
             jt.Mix.DARKEN, jt.Mix.LIGHTEN, jt.Mix.DIFFERENCE, jt.Mix.EXCLUSION]
    W, H = 1920, 1080
    full = jt.BezPath().move_to(0, 0).line_to(W, 0).line_to(W, H).line_to(0, H).close()
    scene.fill(jt.Fill.NON_ZERO, IDENT, _gradient(rng, W / 2, H / 2, W / 2), None, full)
    for i in range(40):
        cx, cy = rng.random() * W, rng.random() * H
        r = 60 + 200 * rng.random()
        clip = circle(cx, cy, r)
        depth = 1 + int(rng.integers(0, 3))
        for d in range(depth):
            blend = jt.BlendMode(mixes[int(rng.integers(0, len(mixes)))], jt.Compose.SRC_OVER)
            scene.push_layer(blend, float(0.5 + 0.5 * rng.random()), IDENT, circle(cx, cy, r * (1 - 0.2 * d)))
        for _ in range(4):
            bx, by = cx + rng.normal(0, r), cy + rng.normal(0, r)
            scene.fill(jt.Fill.NON_ZERO, IDENT, _solid(rng), None, _blob(rng, bx, by, r * 0.5))
        for d in range(depth):
            scene.pop_layer()
    return scene, RenderParams(width=W, height=H, base_color=jt.Color.rgba(1, 1, 1, 1))


def config5(n_paths=10000):
    """Tiger-profile scene: 10k+ mixed paths @1080p."""
    rng = _rng(5)
    scene = jt.Scene()
    W, H = 1920, 1080
    # background
    full = jt.BezPath().move_to(0, 0).line_to(W, 0).line_to(W, H).line_to(0, H).close()
    scene.fill(jt.Fill.NON_ZERO, IDENT, jt.SolidBrush(jt.Color.rgba(0.95, 0.95, 0.9, 1)), None, full)
    # small image brushes
    pix = (rng.random((8, 8, 4)) * 255).astype(np.uint8)
    pix[..., 3] = 255
    image = jt.Image(pixels=pix)
    for i in range(n_paths):
        cx, cy = rng.random() * W, rng.random() * H
        r = 3 + 25 * rng.random() ** 2
        kind = i % 10
        if kind < 6:
            # solid cubic blob (glyph-ish)
            scene.fill(
                jt.Fill.NON_ZERO if i % 3 else jt.Fill.EVEN_ODD,
                IDENT, _solid(rng), None, _blob(rng, cx, cy, r),
            )
        elif kind < 8:
            scene.fill(jt.Fill.NON_ZERO, IDENT, _gradient(rng, cx, cy, r), None, _blob(rng, cx, cy, r))
        elif kind < 9:
            p = jt.BezPath().move_to(cx, cy)
            for _ in range(2):
                d = rng.normal(0, r, 6)
                p.cubic_to(cx + d[0], cy + d[1], cx + d[2], cy + d[3], cx + d[4], cy + d[5])
            scene.stroke(
                jt.Stroke(width=0.5 + 2.5 * rng.random(), join=jt.Join.ROUND).with_caps(jt.Cap.ROUND),
                IDENT, _solid(rng), None, p,
            )
        else:
            scene.fill(
                jt.Fill.NON_ZERO,
                jt.Affine.translate(cx, cy) @ jt.Affine.scale(r / 4),
                jt.ImageBrush(image),
                None,
                jt.BezPath().move_to(0, 0).line_to(8, 0).line_to(8, 8).line_to(0, 8).close(),
            )
    return scene, RenderParams(width=W, height=H, base_color=jt.Color.rgba(1, 1, 1, 1))


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
