"""Multi-stream batched tracking: N concurrent videos through one program.

The reference processes strictly one frame of one video per step (hard
batch-size-1 assert, ocsort_disparity.py:60-62).  On TPU the same weights can
serve many video streams at once: detector convs batch across streams on the
MXU, the per-box depth kernel and the fixed-slot tracker step simply vmap
over a leading stream axis (pure functions, static shapes), and the stream
axis can additionally be sharded over a device mesh so each chip carries its
own set of streams with zero cross-chip traffic (SURVEY.md section 2.8 —
"multi-stream batching" is this model family's scale-out axis).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import tracker as trk
from ..models.detector import YOLOXDetector
from ..models.mot import FrameResult, MOTConfig, predict_frame


def init_stream_states(cfg: MOTConfig, n_streams: int) -> trk.TrackState:
    one = trk.init_state(cfg.tracker)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape).copy(), one)


def predict_frames_batched(variables, module: YOLOXDetector,
                           states: trk.TrackState, inputs: dict,
                           frame_ids: jnp.ndarray, cfg: MOTConfig,
                           scale_factor: Tuple[float, float] = (1.0, 1.0),
                           ) -> Tuple[trk.TrackState, FrameResult]:
    """Advance all streams one frame.

    ``inputs``: dict of (S, 1, H, W, C) tensors (stream-major, keeping the
    per-frame batch dim of ``preprocess_frame``); ``frame_ids``: (S,).
    """
    fn = functools.partial(predict_frame, variables, module, cfg=cfg,
                           scale_factor=scale_factor)
    return jax.vmap(fn)(states, inputs, frame_ids)


class MultiStreamTracker:
    """Host-side convenience wrapper over the batched per-frame program."""

    def __init__(self, cfg: MOTConfig, n_streams: int, variables=None,
                 dtype=jnp.float32, input_shape: Tuple[int, int] = (736, 1280),
                 mesh: Optional[Mesh] = None, stream_axis: str = 'data'):
        self.cfg = cfg
        self.n_streams = n_streams
        self.module = YOLOXDetector(cfg.detector, dtype=dtype)
        if variables is None:
            h, w = input_shape
            dummy = {
                'img': jnp.zeros((1, h, w, 3), jnp.float32),
                'disp_postp': jnp.zeros((1, h, w, 3), jnp.float32),
                'disp_mask': jnp.zeros((1, h, w, 1), jnp.float32),
            }
            variables = self.module.init(jax.random.PRNGKey(0), dummy,
                                         train=False)
        self.mesh = mesh
        self.stream_axis = stream_axis
        if mesh is not None:
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, P()))
        else:
            self.variables = variables
        self.states = init_stream_states(cfg, n_streams)
        if mesh is not None:
            self.states = jax.device_put(
                self.states, NamedSharding(mesh, P(stream_axis)))
        self._step = jax.jit(functools.partial(
            predict_frames_batched, module=self.module, cfg=self.cfg),
            static_argnames=('scale_factor',))

    def shard_inputs(self, inputs: dict) -> dict:
        if self.mesh is None:
            return inputs
        return jax.device_put(
            inputs, NamedSharding(self.mesh, P(self.stream_axis)))

    def track(self, inputs: dict, frame_ids,
              scale_factor: Tuple[float, float] = (1.0, 1.0)) -> FrameResult:
        self.states, result = self._step(
            self.variables, states=self.states,
            inputs=self.shard_inputs(inputs),
            frame_ids=jnp.asarray(frame_ids, jnp.int32),
            scale_factor=scale_factor)
        return result

    def reset(self):
        self.states = init_stream_states(self.cfg, self.n_streams)
        if self.mesh is not None:
            self.states = jax.device_put(
                self.states, NamedSharding(self.mesh, P(self.stream_axis)))
