"""Tracklet post-processing: linear interpolation with optional Gaussian
smoothing (GSI).

Capability of the reference ``InterpolateTracklets``
(/root/reference/mmtrack/models/task_modules/track/interpolation.py): fill
frame gaps of each track id by linear interpolation when the gap is within
[min_num_frames... <= max_num_frames], optionally smooth trajectories with a
Gaussian-process-like RBF smoother (simplified to Gaussian kernel smoothing,
same smoothing intent without sklearn).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def interpolate_tracklets(frames: Dict[int, Tuple[np.ndarray, np.ndarray]],
                          min_num_frames: int = 5,
                          max_num_frames: int = 20,
                          use_gsi: bool = False,
                          gsi_tau: float = 10.0
                          ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """frames: {frame -> (ids, boxes)}; returns a new dict with gap-filled
    (and optionally smoothed) tracklets."""
    # collect per-id trajectories
    by_id: Dict[int, list] = {}
    for f in sorted(frames):
        ids, boxes = frames[f]
        for i, b in zip(np.asarray(ids, int), np.asarray(boxes)):
            by_id.setdefault(int(i), []).append((f, np.asarray(b, float)))

    out: Dict[int, list] = {f: [] for f in frames}
    for tid, traj in by_id.items():
        traj.sort(key=lambda x: x[0])
        fs = np.array([t[0] for t in traj])
        bs = np.stack([t[1] for t in traj])
        # track must be long enough to interpolate
        filled_f, filled_b = [fs[0]], [bs[0]]
        for k in range(1, len(fs)):
            gap = fs[k] - fs[k - 1]
            if 1 < gap <= max_num_frames and len(fs) >= min_num_frames:
                for g in range(1, gap):
                    alpha = g / gap
                    filled_f.append(fs[k - 1] + g)
                    filled_b.append(bs[k - 1] * (1 - alpha) + bs[k] * alpha)
            filled_f.append(fs[k])
            filled_b.append(bs[k])
        filled_f = np.array(filled_f)
        filled_b = np.stack(filled_b)
        if use_gsi and len(filled_f) > 2:
            t = filled_f[:, None].astype(float)
            w = np.exp(-((t - t.T) ** 2) / (2 * gsi_tau ** 2))
            w = w / w.sum(1, keepdims=True)
            filled_b = w @ filled_b
        for f, b in zip(filled_f, filled_b):
            out.setdefault(int(f), []).append((tid, b))

    return {
        f: (np.array([t for t, _ in items], int),
            np.stack([b for _, b in items]) if items else
            np.zeros((0, 4)))
        for f, items in out.items()
    }
