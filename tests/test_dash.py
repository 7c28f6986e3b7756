"""Golden tests for closed-subpath dash semantics (kurbo Dash parity;
the reference consumes curve.Dash at scene.go:156-178)."""

import numpy as np

from jello_tpu.curve import BezPath, ElKind
from jello_tpu.curve.dash import dash


def _square():
    # Perimeter 40; s=0 at (0,0), bottom->right->top->left, clockwise in
    # y-down terms: (0,0) -> (10,0) -> (10,10) -> (0,10) -> close.
    return (
        BezPath()
        .move_to(0, 0)
        .line_to(10, 0)
        .line_to(10, 10)
        .line_to(0, 10)
        .close()
    )


def _subpath_endpoints(path):
    """[(start, end, closed)] per output subpath."""
    out = []
    start = cur = None
    closed = False
    for el in path:
        if el.kind == ElKind.MOVE_TO:
            if start is not None:
                out.append((start, cur, closed))
            start = cur = el.points[0]
            closed = False
        elif el.kind == ElKind.CLOSE_PATH:
            closed = True
        else:
            cur = el.points[-1]
    if start is not None:
        out.append((start, cur, closed))
    return out


def test_closed_seam_dash_merges():
    """Pattern [6,4] offset 2 on the perimeter-40 square: the final
    dash [38,40) merges with the initial [0,4) into one dash crossing
    the seam corner: (0,2) -> (0,0) -> (4,0) (hand-computed)."""
    out = dash(_square(), 2.0, [6.0, 4.0])
    eps = _subpath_endpoints(out)
    assert len(eps) == 4
    # Non-seam dashes: [8,14), [18,24), [28,34).
    exp = [
        ((8, 0), (10, 4)),
        ((10, 8), (6, 10)),
        ((2, 10), (0, 6)),
    ]
    for (s, e, closed), (es, ee) in zip(eps[:3], exp):
        assert not closed
        assert abs(s.x - es[0]) < 1e-6 and abs(s.y - es[1]) < 1e-6
        assert abs(e.x - ee[0]) < 1e-6 and abs(e.y - ee[1]) < 1e-6
    # The merged seam dash comes last: starts at (0,2), crosses the
    # (0,0) corner with a join, ends at (4,0).
    s, e, closed = eps[3]
    assert not closed
    assert abs(s.x - 0) < 1e-6 and abs(s.y - 2) < 1e-6
    assert abs(e.x - 4) < 1e-6 and abs(e.y - 0) < 1e-6


def test_closed_seam_off_no_merge():
    """Offset 0: the pattern ends in a gap at the seam; four separate
    dashes, no merge."""
    out = dash(_square(), 0.0, [6.0, 4.0])
    eps = _subpath_endpoints(out)
    assert len(eps) == 4
    s, e, closed = eps[0]
    assert not closed
    assert abs(s.x - 0) < 1e-6 and abs(s.y - 0) < 1e-6
    assert abs(e.x - 6) < 1e-6 and abs(e.y - 0) < 1e-6


def test_fully_on_closed_stays_closed():
    """A dash longer than the perimeter keeps the subpath closed (joins
    at every corner including the seam, no caps — kurbo behavior)."""
    out = dash(_square(), 0.0, [100.0, 1.0])
    eps = _subpath_endpoints(out)
    assert len(eps) == 1
    s, e, closed = eps[0]
    assert closed


def test_open_path_unaffected_by_merge_logic():
    p = BezPath().move_to(0, 0).line_to(40, 0)
    out = dash(p, 0.0, [6.0, 4.0])
    eps = _subpath_endpoints(out)
    assert len(eps) == 4
    assert all(not c for _, _, c in eps)
    assert abs(eps[0][0].x - 0) < 1e-6
    assert abs(eps[0][1].x - 6) < 1e-6
    assert abs(eps[3][0].x - 30) < 1e-6
    assert abs(eps[3][1].x - 36) < 1e-6
