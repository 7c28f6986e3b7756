"""Native (C++) path encoder vs the pure-Python encoder: byte equality
on randomized paths."""

import numpy as np
import pytest

import jello_tpu as jt
from jello_tpu.encoding import Encoding
from jello_tpu.encoding.path import PathEncoder
from jello_tpu.native import encode_path_native, get_lib


def _python_encode(path, is_fill):
    enc = Encoding()
    pe = PathEncoder(enc, is_fill)
    pe.path(path)
    nsegs = pe.finish(False)
    return np.array(enc.path_tags, dtype=np.uint8), bytes(enc.path_data), nsegs


def _random_path(rng, n_els, closed_prob=0.3, dup_prob=0.15):
    p = jt.BezPath()
    cur = None
    for i in range(n_els):
        kind = rng.integers(0, 5)
        c = rng.random(6) * 100
        if rng.random() < dup_prob and cur is not None:
            # degenerate: repeat the current point
            c[:] = [cur[0], cur[1]] * 3
        if kind == 0 or cur is None:
            p.move_to(c[0], c[1])
            cur = (c[0], c[1])
        elif kind == 1:
            p.line_to(c[0], c[1])
            cur = (c[0], c[1])
        elif kind == 2:
            p.quad_to(*c[:4])
            cur = (c[2], c[3])
        elif kind == 3:
            p.cubic_to(*c)
            cur = (c[4], c[5])
        else:
            p.close()
    return p


@pytest.mark.skipif(get_lib() is None, reason="native encoder unavailable")
@pytest.mark.parametrize("is_fill", [True, False])
def test_native_matches_python(is_fill):
    rng = np.random.default_rng(7)
    for trial in range(60):
        path = _random_path(rng, int(rng.integers(1, 12)))
        got = encode_path_native(path, is_fill)
        tags_n, data_n, nsegs_n = got
        tags_p, data_p, nsegs_p = _python_encode(path, is_fill)
        assert nsegs_n == nsegs_p, (trial, path.elements)
        assert bytes(tags_n) == bytes(tags_p), (trial, path.elements)
        assert bytes(data_n.tobytes()) == data_p, (trial, path.elements)


@pytest.mark.skipif(get_lib() is None, reason="native encoder unavailable")
def test_native_wired_into_encoding():
    import os

    path = jt.BezPath().move_to(0, 0).cubic_to(10, 0, 10, 10, 0, 10).close()
    enc_nat = Encoding()
    enc_nat.encode_path(path, True)
    os.environ["JELLO_TPU_NO_NATIVE"] = "1"
    try:
        enc_py = Encoding()
        enc_py.encode_path(path, True)
    finally:
        del os.environ["JELLO_TPU_NO_NATIVE"]
    assert enc_nat.path_tags == enc_py.path_tags
    assert bytes(enc_nat.path_data) == bytes(enc_py.path_data)
    assert enc_nat.n_paths == enc_py.n_paths == 1
