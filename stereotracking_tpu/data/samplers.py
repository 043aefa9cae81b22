"""Samplers: video-ordered evaluation, whole-video batches, quota sampling.

Capabilities of the reference samplers
(/root/reference/mmtrack/datasets/samplers/video_sampler.py:12-84,
entire_video_batch_sampler.py:9-47, quota_sampler.py): evaluation splits
whole videos contiguously across hosts and iterates frames in order.
"""
from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


class VideoSampler:
    """Split videos contiguously across ``world_size`` hosts; iterate every
    frame of this host's videos in temporal order."""

    def __init__(self, dataset, rank: int = 0, world_size: int = 1):
        self.dataset = dataset
        vids = dataset.videos()
        if len(vids) < world_size:
            raise ValueError(
                f'{len(vids)} videos cannot be split over {world_size} hosts')
        chunks = np.array_split(np.asarray(vids), world_size)
        self.vids = list(chunks[rank])

    def __iter__(self) -> Iterator[int]:
        for vid in self.vids:
            yield from self.dataset.video_frames(vid)

    def __len__(self) -> int:
        return sum(len(self.dataset.video_frames(v)) for v in self.vids)


class EntireVideoBatchSampler:
    """Yield all frame ids of one video per batch."""

    def __init__(self, dataset, rank: int = 0, world_size: int = 1):
        self.sampler = VideoSampler(dataset, rank, world_size)

    def __iter__(self) -> Iterator[List[int]]:
        for vid in self.sampler.vids:
            yield list(self.sampler.dataset.video_frames(vid))


class QuotaSampler:
    """Fixed number of random samples per epoch (SOT-style training)."""

    def __init__(self, dataset_len: int, samples_per_epoch: int,
                 seed: int = 0, replacement: bool = True):
        self.dataset_len = dataset_len
        self.samples_per_epoch = samples_per_epoch
        self.rng = np.random.RandomState(seed)
        self.replacement = replacement

    def __iter__(self) -> Iterator[int]:
        if self.replacement or self.samples_per_epoch > self.dataset_len:
            idx = self.rng.randint(0, self.dataset_len,
                                   self.samples_per_epoch)
        else:
            idx = self.rng.permutation(
                self.dataset_len)[:self.samples_per_epoch]
        return iter(idx.tolist())

    def __len__(self):
        return self.samples_per_epoch
