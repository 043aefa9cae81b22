"""A/B the MaskTrack R-CNN greedy tracker (match scores + assign +
slot memory) against an independent numpy oracle over random worlds
(reference masktrack_rcnn_tracker.py:37-95)."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_tracker import iou_matrix  # noqa: E402

from stereotracking_tpu.models.vis import (  # noqa: E402
    init_vis_state, masktrack_assign, masktrack_match_scores,
    masktrack_update)


class OracleMaskTrack:
    """Plain dict transcription: match score = log softmax(similarity
    w/ dummy col) + w_det*log(score) + w_iou*iou + w_label*label-eq;
    greedy per-det argmax where a track keeps only its best match."""

    def __init__(self, det_w=1.0, iou_w=2.0, label_w=10.0):
        self.w = (det_w, iou_w, label_w)
        self.tracks = {}          # id -> (embed, bbox, label)
        self.num_tracks = 0

    def step(self, bboxes, labels, scores, embeds):
        n = len(bboxes)
        tids = sorted(self.tracks)
        m = len(tids)
        sim = np.zeros((n, m + 1))
        ious = np.zeros((n, m + 1))
        lbl = np.ones((n, m + 1))
        if m:
            temb = np.stack([self.tracks[t][0] for t in tids])
            sim[:, 1:] = embeds @ temb.T
            tb = np.stack([self.tracks[t][1] for t in tids])
            ious[:, 1:] = iou_matrix(bboxes, tb)
            tl = np.asarray([self.tracks[t][2] for t in tids])
            lbl[:, 1:] = (labels[:, None] == tl[None, :])
        ex = np.exp(sim - sim.max(axis=1, keepdims=True))
        logsm = np.log(ex / ex.sum(axis=1, keepdims=True))
        dw, iw, lw = self.w
        score = (logsm + dw * np.log(np.clip(scores, 1e-12, None))[:, None]
                 + iw * ious + lw * lbl)

        ids = -np.ones(n, int)
        best = {t: -1e6 for t in tids}
        for i in range(n):
            k = int(score[i].argmax())
            if k == 0:
                ids[i] = self.num_tracks
                self.num_tracks += 1
            else:
                t = tids[k - 1]
                if score[i, k] > best[t]:
                    ids[i] = t
                    best[t] = score[i, k]

        for i in range(n):
            if ids[i] >= 0:
                self.tracks[ids[i]] = (embeds[i].copy(),
                                       bboxes[i].copy(), int(labels[i]))
        return ids


def _world(seed, frames=6, max_dets=6, embed_dim=8):
    rng = np.random.RandomState(seed)
    tracks = []
    for k in range(4):
        x, y = rng.rand(2) * 300 + 50
        vx, vy = rng.randn(2) * 3
        w, h = rng.rand(2) * 40 + 25
        emb = rng.randn(embed_dim) * 2
        tracks.append((x, y, vx, vy, w, h, emb))
    out = []
    for f in range(frames):
        boxes, scores, labels, embeds = [], [], [], []
        for k, (x, y, vx, vy, w, h, emb) in enumerate(tracks):
            if rng.rand() < 0.2:
                continue
            cx, cy = x + vx * f, y + vy * f
            jit = rng.randn(4) * 1.5
            boxes.append([cx - w / 2 + jit[0], cy - h / 2 + jit[1],
                          cx + w / 2 + jit[2], cy + h / 2 + jit[3]])
            scores.append(0.4 + 0.59 * rng.rand())
            labels.append(k % 2)
            embeds.append(emb + rng.randn(embed_dim) * 0.1)
        n = len(boxes)
        pad = max_dets - n
        out.append((
            np.asarray(boxes + [[0, 0, 1, 1]] * pad, np.float32),
            np.asarray(scores + [0.5] * pad, np.float32),
            np.asarray(labels + [0] * pad, np.int32),
            np.asarray(embeds + [np.zeros(embed_dim)] * pad, np.float32),
            np.asarray([True] * n + [False] * pad)))
    return out


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_masktrack_matches_oracle(seed):
    state = init_vis_state(16, embed_dim=8)
    oracle = OracleMaskTrack()
    for f, (boxes, scores, labels, embeds, valid) in enumerate(
            _world(seed)):
        ms = masktrack_match_scores(jnp.asarray(boxes),
                                    jnp.asarray(labels),
                                    jnp.asarray(scores),
                                    jnp.asarray(embeds), state)
        ids, _ = masktrack_assign(ms, jnp.asarray(valid), state)
        state = masktrack_update(state, ids, jnp.asarray(boxes),
                                 jnp.asarray(labels), jnp.asarray(embeds),
                                 jnp.asarray(valid))
        n = int(valid.sum())
        ref_ids = oracle.step(boxes[:n], labels[:n], scores[:n],
                              embeds[:n])
        got = np.asarray(ids)[:n]
        np.testing.assert_array_equal(
            got, ref_ids, err_msg=f'seed={seed} frame={f}')
