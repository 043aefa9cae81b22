"""Appearance-Free Link (AFLink) tracklet post-linker.

Capability of the reference's ``AppearanceFreeLink``
(/root/reference/mmtrack/models/task_modules/track/aflink.py): a small
temporal-conv MLP scores whether two tracklets belong to the same object
from their (t, x, y, w, h) motion windows alone; high-scoring
temporally/spatially-compatible pairs are merged with a cost-threshold
Hungarian pass.  Model in Flax; linking logic in numpy (host-side
post-processing, like the reference).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scipy.optimize import linear_sum_assignment


class _TemporalEncoder(nn.Module):
    """Per-tracklet encoder: temporal convs over the (T=30, 5) window."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, 30, 5)
        x = x[..., None]                                 # (B, 30, 5, 1)
        # temporal block 1: (7,1) conv over time per measure channel
        for i, ch in enumerate((32, 64, 128, 256)):
            k = (7, 1) if i == 0 else (3, 1)
            x = nn.Conv(ch, k, padding='VALID', use_bias=False,
                        dtype=self.dtype, name=f'tconv{i}')(x)
            x = nn.relu(x)
        # fusion over the 5 measures
        x = nn.Conv(256, (1, 3), padding='VALID', use_bias=False,
                    dtype=self.dtype, name='fusion')(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))                  # (B, 256)


class AFLinkModel(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2):  # (B, 30, 5) each
        enc = _TemporalEncoder(dtype=self.dtype, name='encoder')
        f1, f2 = enc(x1), enc(x2)
        h = jnp.concatenate([f1, f2], axis=-1)
        h = nn.relu(nn.Dense(128, dtype=self.dtype, name='fc1')(h))
        logits = nn.Dense(2, dtype=self.dtype, name='fc2')(h)
        return jax.nn.softmax(logits, axis=-1)


def normalize_pair(w1: np.ndarray, w2: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Joint min-max normalization of a (padded) window pair, exactly the
    reference's ``data_transform`` (aflink.py:196-203): per channel over
    the concatenation, map to [-1, 1] via (max+min)/2 and (max-min)/2.
    Padding rows participate in the min/max like the reference's np.pad
    output does."""
    both = np.concatenate([w1, w2], axis=0)
    lo, hi = both.min(0), both.max(0)
    sub = (hi + lo) / 2
    div = (hi - lo) / 2 + 1e-5
    return (w1 - sub) / div, (w2 - sub) / div


class AppearanceFreeLink:
    """Merge tracklets whose AFLink score exceeds the threshold.

    Args mirror the reference: temporal window [t_min, t_max] between the
    end of one tracklet and the start of the next (inclusive, reference
    :239-241), spatial distance limit, link-probability threshold.
    """

    def __init__(self, variables=None, temporal_threshold=(0, 30),
                 spatial_threshold: float = 75.0,
                 confidence_threshold: float = 0.95, window: int = 30):
        self.model = AFLinkModel()
        self.window = window
        if variables is None:
            dummy = jnp.zeros((1, window, 5))
            variables = self.model.init(jax.random.PRNGKey(0), dummy, dummy)
        self.variables = variables
        self.t_min, self.t_max = temporal_threshold
        self.spatial_threshold = spatial_threshold
        self.confidence_threshold = confidence_threshold
        self._apply = jax.jit(
            lambda v, a, b: self.model.apply(v, a, b))

    def _window(self, rows: np.ndarray, tail: bool) -> np.ndarray:
        """rows: (n, 5) = (frame, x, y, w, h) sorted by frame; zero-padded
        30-frame window from the end (tail) or start (head)."""
        w = np.zeros((self.window, 5), np.float32)
        seg = rows[-self.window:] if tail else rows[:self.window]
        if tail:
            w[-len(seg):] = seg
        else:
            w[:len(seg)] = seg
        return w

    def link(self, frames: Dict[int, Tuple[np.ndarray, np.ndarray]]
             ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """frames: {frame -> (ids, boxes xyxy)} -> same with merged ids."""
        tracks: Dict[int, list] = {}
        for f in sorted(frames):
            ids, boxes = frames[f]
            for i, b in zip(np.asarray(ids, int), np.asarray(boxes)):
                cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
                tracks.setdefault(int(i), []).append(
                    [f, cx, cy, b[2] - b[0], b[3] - b[1]])
        tids = sorted(tracks)
        info = {t: np.asarray(sorted(tracks[t]), np.float32) for t in tids}

        pairs = []
        for a in tids:
            for b in tids:
                if a == b:
                    continue
                gap = info[b][0, 0] - info[a][-1, 0]
                if not (self.t_min <= gap <= self.t_max):
                    continue
                dist = np.hypot(info[a][-1, 1] - info[b][0, 1],
                                info[a][-1, 2] - info[b][0, 2])
                if dist > self.spatial_threshold:
                    continue
                pairs.append((a, b))
        if not pairs:
            return frames

        w1s, w2s = [], []
        for a, b in pairs:
            w1, w2 = normalize_pair(self._window(info[a], tail=True),
                                    self._window(info[b], tail=False))
            w1s.append(w1)
            w2s.append(w2)
        probs = np.asarray(self._apply(
            self.variables, jnp.asarray(np.stack(w1s)),
            jnp.asarray(np.stack(w2s))))[:, 1]

        # cost-threshold Hungarian over (ending tracklet, starting tracklet)
        ends = sorted({a for a, _ in pairs})
        starts = sorted({b for _, b in pairs})
        cost = np.ones((len(ends), len(starts)))
        for (a, b), p in zip(pairs, probs):
            cost[ends.index(a), starts.index(b)] = 1.0 - p
        rows, cols = linear_sum_assignment(cost)
        remap = {}
        for r, c in zip(rows, cols):
            if cost[r, c] <= 1.0 - self.confidence_threshold:
                remap[starts[c]] = ends[r]

        def resolve(i):
            while i in remap:
                i = remap[i]
            return i

        return {f: (np.asarray([resolve(int(i)) for i in ids], int), boxes)
                for f, (ids, boxes) in frames.items()}
