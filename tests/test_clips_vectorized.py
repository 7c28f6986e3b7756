"""Vectorized clip resolution vs the sequential stack walk."""

import numpy as np

from jello_tpu.pipeline import clips


def test_vectorized_matches_sequential():
    rng = np.random.default_rng(3)
    for trial in range(100):
        NC = 32
        seq = []
        depth = 0
        n = int(rng.integers(1, 24))
        for _ in range(n):
            if depth > 0 and rng.random() < 0.4:
                seq.append(0)
                depth -= 1
            else:
                seq.append(1)
                depth += 1
        while depth > 0:
            seq.append(0)
            depth -= 1
        n = len(seq)
        if n > NC:
            continue
        clip_idx = np.zeros(NC, np.int32)
        clip_path = np.zeros(NC, np.int32)
        P = 64
        pb = rng.random((P, 4)).astype(np.float32) * 100
        pb[:, 2:] += pb[:, :2]
        for i, s in enumerate(seq):
            clip_idx[i] = i
            clip_path[i] = int(rng.integers(0, P)) if s else ~i
        layout = {"n_clips": np.int32(n)}
        caps = {"n_clips_cap": NC, "clip_depth_cap": 32}
        dmp = np.arange(128, dtype=np.int32)
        dms = np.arange(128, dtype=np.int32) * 7
        b1, p1, s1 = clips.clip_leaf(
            np, clip_idx, clip_path, pb, dmp.copy(), dms.copy(), layout, caps
        )
        b2, p2, s2 = clips.clip_leaf_vectorized(
            np, clip_idx, clip_path, pb, dmp.copy(), dms.copy(), layout, caps
        )
        assert np.allclose(b1[:n], b2[:n]), (trial, seq)
        assert (p1 == p2).all() and (s1 == s2).all(), (trial, seq)
