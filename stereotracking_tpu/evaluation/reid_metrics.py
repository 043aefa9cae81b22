"""ReID evaluation: mAP + CMC rank accuracies.

Faithful numpy re-creation of
/root/reference/mmtrack/evaluation/metrics/reid_metrics.py:75-140:
self-gallery protocol (every sample queries all others), euclidean
distance ranking, queries whose identity never appears elsewhere are
skipped, CMC curves averaged over valid queries.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def evaluate_reid(features: np.ndarray, pids: np.ndarray,
                  max_rank: int = 20,
                  rank_list: Sequence[int] = (1, 5, 10, 20)
                  ) -> Dict[str, float]:
    """``features`` (N, C), ``pids`` (N,) identity labels."""
    features = np.asarray(features, float)
    pids = np.asarray(pids)
    n = len(features)
    sq = (features ** 2).sum(axis=1)
    dist = sq[:, None] + sq[None, :] - 2.0 * features @ features.T
    indices = np.argsort(dist, axis=1)
    matches = (pids[indices] == pids[:, None]).astype(np.int32)

    all_cmc: List[np.ndarray] = []
    all_ap: List[float] = []
    num_valid = 0
    for q in range(n):
        raw = matches[q][1:]                # drop self (rank 0)
        if not raw.any():
            continue
        cmc = raw.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_valid += 1
        num_rel = raw.sum()
        prec = raw.cumsum() / (np.arange(len(raw)) + 1.0)
        all_ap.append(float((prec * raw).sum() / num_rel))

    assert num_valid > 0, 'no query identity appears in the gallery'
    cmc_mean = np.stack(all_cmc).sum(axis=0) / num_valid
    out = {'mAP': round(float(np.mean(all_ap)), 3)}
    for r in rank_list:
        out[f'R{r}'] = round(float(cmc_mean[r - 1]), 3)
    return out
