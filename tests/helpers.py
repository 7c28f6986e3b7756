"""Shared test utilities: scene rendering + supersampled ground truth."""

from __future__ import annotations

import numpy as np

import jello_tpu as jt
from jello_tpu.cpu.pipeline import build_layout_dict, render
from jello_tpu.renderer.estimate import estimate_caps
from jello_tpu.renderer.params import RenderParams
from jello_tpu.renderer.resolve import Resolver


def render_scene(build, width=256, height=256, base=None):
    scene = jt.Scene()
    build(scene)
    params = RenderParams(
        width=width,
        height=height,
        base_color=base or jt.Color.rgba(0, 0, 0, 0),
    )
    img, flags, caps = render(scene, params)
    assert not any(bool(v) for v in flags.values()), flags
    return img


def fill_scene(path, rule=None, color=None, transform=None):
    def build(scene):
        scene.fill(
            rule if rule is not None else jt.Fill.NON_ZERO,
            transform or jt.Affine.identity(),
            jt.SolidBrush(color or jt.Color.rgba(0, 1, 0, 1)),
            None,
            path,
        )

    return build


def line_soup(build, width=256, height=256):
    """Flattened line soup for a scene (for ground-truth rasterization)."""
    from jello_tpu.pipeline import flatten as fm

    scene = jt.Scene()
    build(scene)
    params = RenderParams(width=width, height=height, base_color=jt.Color.rgba(0, 0, 0, 0))
    layout, _, _, s = Resolver().resolve(scene.encoding)
    fl = fm.flatten_stage(
        np, s, build_layout_dict(layout, params), estimate_caps(layout, width, height)
    )
    v = np.asarray(fl["line_valid"])
    return (
        np.asarray(fl["line_x0"])[v],
        np.asarray(fl["line_y0"])[v],
        np.asarray(fl["line_x1"])[v],
        np.asarray(fl["line_y1"])[v],
        np.asarray(fl["line_path"])[v],
    )


def supersample_coverage(x0, y0, x1, y1, width, height, ss=4, even_odd=False):
    """Winding-rule rasterization of a line soup at ss*ss samples/pixel."""
    ys, xs = np.mgrid[0 : height * ss, 0 : width * ss]
    px = (xs + 0.5) / ss
    py = (ys + 0.5) / ss
    wind = np.zeros(px.shape, np.int32)
    for a0, b0, a1, b1 in zip(x0, y0, x1, y1):
        if b0 == b1:
            continue
        ymin, ymax = min(b0, b1), max(b0, b1)
        m = (py >= ymin) & (py < ymax)
        t = (py - b0) / (b1 - b0)
        xi = a0 + t * (a1 - a0)
        c = m & (px < xi)
        wind += np.where(c, np.where(b1 > b0, 1, -1), 0)
    covered = (wind & 1) != 0 if even_odd else wind != 0
    return covered.reshape(height, ss, width, ss).mean(axis=(1, 3))
