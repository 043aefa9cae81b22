"""A/B the fixed-slot QDTrack step against an independent numpy oracle
over random detection worlds (reference
quasi_dense_tracker.py:83-302)."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_qdtrack import OracleQDTrack  # noqa: E402

from stereotracking_tpu.models.qdtrack import (  # noqa: E402
    QDTrackConfig, init_state, qdtrack_step)


def _world(seed, frames=8, max_dets=8, embed_dim=8):
    rng = np.random.RandomState(seed)
    tracks = []
    for k in range(4):
        x, y = rng.rand(2) * 300 + 50
        vx, vy = rng.randn(2) * 4
        w, h = rng.rand(2) * 40 + 25
        emb = rng.randn(embed_dim) * 3
        tracks.append((x, y, vx, vy, w, h, emb))
    out = []
    for f in range(frames):
        boxes, scores, labels, embeds = [], [], [], []
        for k, (x, y, vx, vy, w, h, emb) in enumerate(tracks):
            if rng.rand() < 0.15:
                continue
            cx, cy = x + vx * f, y + vy * f
            jit = rng.randn(4) * 1.5
            boxes.append([cx - w / 2 + jit[0], cy - h / 2 + jit[1],
                          cx + w / 2 + jit[2], cy + h / 2 + jit[3]])
            scores.append(0.55 + 0.43 * rng.rand())
            labels.append(k % 2)
            embeds.append(emb + rng.randn(embed_dim) * 0.1)
        for _ in range(rng.randint(0, 3)):
            x0, y0 = rng.rand(2) * 400
            boxes.append([x0, y0, x0 + 30, y0 + 30])
            scores.append(0.2 + 0.7 * rng.rand())
            labels.append(int(rng.randint(2)))
            embeds.append(rng.randn(embed_dim) * 3)
        n = len(boxes)
        pad = max_dets - n
        assert pad >= 0
        out.append((
            np.asarray(boxes + [[0, 0, 1, 1]] * pad, np.float32),
            np.asarray(scores + [0.0] * pad, np.float32),
            np.asarray(labels + [0] * pad, np.int32),
            np.asarray(embeds + [np.zeros(embed_dim)] * pad, np.float32),
            np.asarray([True] * n + [False] * pad)))
    return out


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_qdtrack_matches_oracle(seed):
    cfg = QDTrackConfig(num_slots=16, num_backdrops=1, embed_dim=8)
    state = init_state(cfg)
    oracle = OracleQDTrack()
    for f, (boxes, scores, labels, embeds, valid) in enumerate(
            _world(seed)):
        state, ids = qdtrack_step(
            state, jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(labels), jnp.asarray(embeds), jnp.asarray(valid),
            jnp.int32(f), cfg)
        n = int(valid.sum())
        ref_ids = oracle.step(boxes[:n], scores[:n], labels[:n],
                              embeds[:n], f)
        got = np.asarray(ids)[:n]
        np.testing.assert_array_equal(
            got, ref_ids, err_msg=f'seed={seed} frame={f}')
