"""A/B the fixed-slot Tracktor step against an independent numpy oracle
over random detection worlds with shared deterministic regression/embed
closures (reference tracktor_tracker.py:49-272)."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_tracktor import OracleTracktor  # noqa: E402

from stereotracking_tpu.models.tracktor import (  # noqa: E402
    TracktorConfig, init_state, tracktor_step)

_W = np.linspace(0.01, 0.04, 4)


def reg_of(bbox):
    b = np.asarray(bbox, np.float64)
    shift = np.sin(b.sum() * 0.01) * 3.0
    reg = b + np.array([shift, -shift, shift, -shift])
    score = 0.4 + 0.55 * (0.5 + 0.5 * np.sin(b @ _W))
    return reg.astype(np.float64), float(score)


def emb_of(bbox):
    b = np.asarray(bbox, np.float64)
    return np.sin(np.outer(b, _W * 40).reshape(-1))[:8]


def _world(seed, frames=8, max_dets=6):
    rng = np.random.RandomState(seed)
    tracks = []
    for k in range(4):
        x, y = rng.rand(2) * 300 + 50
        vx, vy = rng.randn(2) * 3
        w, h = rng.rand(2) * 40 + 25
        tracks.append((x, y, vx, vy, w, h))
    out = []
    for f in range(frames):
        boxes, scores, labels, embeds = [], [], [], []
        for k, (x, y, vx, vy, w, h) in enumerate(tracks):
            if rng.rand() < 0.2:
                continue
            cx, cy = x + vx * f, y + vy * f
            jit = rng.randn(4) * 1.5
            box = [cx - w / 2 + jit[0], cy - h / 2 + jit[1],
                   cx + w / 2 + jit[2], cy + h / 2 + jit[3]]
            boxes.append(box)
            scores.append(0.45 + 0.5 * rng.rand())
            labels.append(0)
            embeds.append(emb_of(np.asarray(box)) + rng.randn(8) * 0.01)
        n = len(boxes)
        pad = max_dets - n
        out.append((
            np.asarray(boxes + [[0, 0, 1, 1]] * pad, np.float64),
            np.asarray(scores + [0.0] * pad, np.float64),
            np.asarray(labels + [0] * pad, np.int32),
            np.asarray(embeds + [np.zeros(8)] * pad, np.float64),
            np.asarray([True] * n + [False] * pad)))
    return out


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_tracktor_matches_oracle(seed):
    cfg = TracktorConfig(num_slots=12, embed_dim=8, num_samples=3)
    state = init_state(cfg)
    oracle = OracleTracktor(num_samples=3)
    k = cfg.num_slots
    for f, (boxes, scores, labels, embeds, valid) in enumerate(
            _world(seed)):
        sb = np.asarray(state.bbox, np.float64)
        regs = [reg_of(sb[s]) for s in range(k)]
        reg_boxes = np.stack([r[0] for r in regs])
        reg_scores = np.asarray([r[1] for r in regs])
        prop_embeds = np.stack([emb_of(r[0]) for r in regs])
        state, (ob, os_, ol, oid, ov) = tracktor_step(
            state, jnp.asarray(reg_boxes, jnp.float32),
            jnp.asarray(reg_scores, jnp.float32),
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(scores, jnp.float32),
            jnp.asarray(labels), jnp.asarray(embeds, jnp.float32),
            jnp.asarray(valid), jnp.asarray(prop_embeds, jnp.float32),
            jnp.int32(f), cfg)
        n = int(valid.sum())
        ref_ids, ref_prop = oracle.step(reg_of, emb_of, boxes[:n],
                                        scores[:n], labels[:n],
                                        embeds[:n], f)
        got_det = np.asarray(oid)[k:k + n]
        np.testing.assert_array_equal(
            got_det, ref_ids, err_msg=f'seed={seed} frame={f} dets')
        got_prop = sorted(int(i) for i, v in
                          zip(np.asarray(oid)[:k], np.asarray(ov)[:k])
                          if v and i >= 0)
        assert got_prop == ref_prop, \
            f'seed={seed} frame={f} prop {got_prop} != {ref_prop}'
