"""ReID dataset + triplet sampling + input packing.

Re-creates /root/reference/mmtrack/datasets/reid_dataset.py (annotation
file of ``<img> <pid>`` lines, hard-mining triplet sampling: ins_per_id
positives for the anchor id plus ins_per_id samples for each of
num_ids-1 random negative ids) and the ``PackReIDInputs`` surface
(/root/reference/mmtrack/datasets/transforms/formatting.py:378-460):
stacked (N, H, W, 3) crops + (N,) labels ready for BaseReID.
"""
from __future__ import annotations

import os.path as osp
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np


class ReIDDataset:
    """Annotation file: one ``<relative_img_path> <person_id>`` per line."""

    def __init__(self, ann_file: str, data_prefix: str = '',
                 triplet_sampler: Optional[dict] = None):
        self.data_prefix = data_prefix
        self.triplet_sampler = triplet_sampler
        self.data_list: List[dict] = []
        with open(ann_file) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                path, pid = line.rsplit(' ', 1)
                self.data_list.append(dict(
                    img_path=osp.join(data_prefix, path),
                    gt_label=int(pid)))
        self.index_dic: Dict[int, np.ndarray] = defaultdict(list)
        for i, info in enumerate(self.data_list):
            self.index_dic[info['gt_label']].append(i)
        self.index_dic = {k: np.asarray(v, int)
                          for k, v in self.index_dic.items()}
        self.pids = sorted(self.index_dic)

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx: int):
        info = self.data_list[idx]
        if self.triplet_sampler is not None:
            return self.triplet_sampling(info['gt_label'],
                                         **self.triplet_sampler)
        return dict(info)

    def triplet_sampling(self, pos_pid: int, num_ids: int = 8,
                         ins_per_id: int = 4, rng=None) -> Dict[str, list]:
        """reid_dataset.py:80-126 exact procedure."""
        rng = rng or np.random
        assert len(self.pids) >= num_ids
        pos_idxs = self.index_dic[int(pos_pid)]
        picks = list(pos_idxs[rng.choice(len(pos_idxs), ins_per_id,
                                         replace=True)])
        neg_pids = rng.choice([p for p in self.pids if p != pos_pid],
                              num_ids - 1, replace=False)
        for neg in neg_pids:
            neg_idxs = self.index_dic[int(neg)]
            picks.extend(neg_idxs[rng.choice(len(neg_idxs), ins_per_id,
                                             replace=True)])
        infos = [dict(self.data_list[i]) for i in picks]
        return {k: [info[k] for info in infos] for k in infos[0]}


def pack_reid_inputs(imgs: Sequence[np.ndarray],
                     labels: Sequence[int],
                     out_hw: Sequence[int] = (256, 128)):
    """PackReIDInputs analog: resize crops to the ReID input scale and
    stack into (N, H, W, 3) float32 + (N,) int32 labels."""
    import PIL.Image

    oh, ow = out_hw
    stack = []
    for im in imgs:
        p = PIL.Image.fromarray(np.asarray(im).astype(np.uint8))
        stack.append(np.asarray(p.resize((ow, oh), PIL.Image.BILINEAR),
                                np.float32))
    return np.stack(stack), np.asarray(labels, np.int32)
