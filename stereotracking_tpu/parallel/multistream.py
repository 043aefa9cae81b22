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
from ..models.mot import (FrameResult, MOTConfig, predict_frame,
                          predict_frame_raw)


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

        def _step_raw(variables, states, imgs, disps, frame_ids,
                      out_h, out_w, scale_factor):
            fn = functools.partial(predict_frame_raw, variables, self.module,
                                   cfg=self.cfg, out_h=out_h, out_w=out_w,
                                   scale_factor=scale_factor)
            return jax.vmap(fn)(states, imgs, disps, frame_ids)

        self._step_raw = jax.jit(
            _step_raw, static_argnames=('out_h', 'out_w', 'scale_factor'))

        def _step_packed(variables, states, imgs, disps, ipacks, dpacks,
                         frame_ids, out_h, out_w, scale_factor):
            fn = functools.partial(predict_frame_raw, variables, self.module,
                                   cfg=self.cfg, out_h=out_h, out_w=out_w,
                                   scale_factor=scale_factor)
            return jax.vmap(fn)(states, imgs, disps, frame_ids,
                                img_pack=ipacks, disp_pack=dpacks)

        self._step_packed = jax.jit(
            _step_packed, static_argnames=('out_h', 'out_w', 'scale_factor'))

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

    def track_raw(self, imgs_u8, disps_u16, frame_ids,
                  scale_factor: Tuple[float, float] = (1.0, 1.0)
                  ) -> FrameResult:
        """Advance all streams one frame from RAW decoded frames.

        ``imgs_u8``: (S, H, W, 3) uint8; ``disps_u16``: (S, H, W) uint16.
        Device-side preprocessing (cast/mask//16/pad) runs INSIDE the same
        per-frame program as detector+depth+tracker."""
        from ..models.preprocessor import padded_shape
        h, w = imgs_u8.shape[1], imgs_u8.shape[2]
        oh, ow = padded_shape(h, w)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.stream_axis))
            imgs_u8 = jax.device_put(imgs_u8, sh)
            disps_u16 = jax.device_put(disps_u16, sh)
        self.states, result = self._step_raw(
            self.variables, self.states, imgs_u8, disps_u16,
            jnp.asarray(frame_ids, jnp.int32), out_h=oh, out_w=ow,
            scale_factor=scale_factor)
        return result

    @staticmethod
    def pack_frames(imgs_u8, disps_u16, out_h: int, out_w: int,
                    out_img=None, out_disp=None):
        """Host-side stem-layout packing of a batch of raw frames (the
        data-loader step of the pallas-stem serving path; C++ SIMD packer,
        csrc/stem_pack.cpp, one native call per modality for the whole
        batch).  Returns (img_packs uint8 (S, HQ, 48, WQ), disp_packs bf16
        (S, HQ, 16, WQ)).  ``out_img``/``out_disp``: optional preallocated
        destinations (uint8 / uint16 bit patterns) so a pipelined server
        packs without allocating."""
        import ml_dtypes
        import numpy as np

        from .._native import stem_pack_disp_bf16_batch, stem_pack_u8_batch
        from ..ops.stem_pallas import stem_pack_wq
        wq = stem_pack_wq(out_w)
        ip = stem_pack_u8_batch(np.asarray(imgs_u8), wq, hp=out_h, wp=out_w,
                                out=out_img)
        dp = stem_pack_disp_bf16_batch(np.asarray(disps_u16), wq, hp=out_h,
                                       wp=out_w, out=out_disp)
        return ip, dp.view(ml_dtypes.bfloat16)

    def track_packed(self, imgs_u8, disps_u16, img_packs, disp_packs,
                     frame_ids,
                     scale_factor: Tuple[float, float] = (1.0, 1.0)
                     ) -> FrameResult:
        """``track_raw`` with host-packed stem inputs (see ``pack_frames``):
        the Focus stems evaluate via the pallas kernel — the production
        serving path on TPU (~5x faster stems at 1080p)."""
        from ..models.preprocessor import padded_shape
        h, w = imgs_u8.shape[1], imgs_u8.shape[2]
        oh, ow = padded_shape(h, w)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.stream_axis))
            imgs_u8, disps_u16, img_packs, disp_packs = (
                jax.device_put(x, sh)
                for x in (imgs_u8, disps_u16, img_packs, disp_packs))
        self.states, result = self._step_packed(
            self.variables, self.states, imgs_u8, disps_u16, img_packs,
            disp_packs, jnp.asarray(frame_ids, jnp.int32), out_h=oh,
            out_w=ow, scale_factor=scale_factor)
        return result

    def reset(self):
        self.states = init_stream_states(self.cfg, self.n_streams)
        if self.mesh is not None:
            self.states = jax.device_put(
                self.states, NamedSharding(self.mesh, P(self.stream_axis)))

    def track_packed_chunk(self, imgs_u8, disps_u16, img_packs, disp_packs,
                           frame_ids,
                           scale_factor: Tuple[float, float] = (1.0, 1.0)):
        """``track_raw_chunk`` with host-packed stem inputs: T frames per
        stream advance in ONE device program with the pallas Focus stems.
        ``img_packs``: (T, S, HQ, 48, WQ) uint8; ``disp_packs``:
        (T, S, HQ, 16, WQ) bf16 (see ``pack_frames``)."""
        from ..models.preprocessor import padded_shape
        h, w = imgs_u8.shape[2], imgs_u8.shape[3]
        oh, ow = padded_shape(h, w)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(None, self.stream_axis))
            imgs_u8, disps_u16, img_packs, disp_packs = (
                jax.device_put(x, sh)
                for x in (imgs_u8, disps_u16, img_packs, disp_packs))
        if not hasattr(self, '_step_packed_chunk'):
            def _chunk(variables, states, imgs, disps, ipacks, dpacks,
                       fids, out_h, out_w, scale_factor):
                fn = functools.partial(
                    predict_frame_raw, variables, self.module,
                    cfg=self.cfg, out_h=out_h, out_w=out_w,
                    scale_factor=scale_factor)

                def body(st, x):
                    im, dp, ipk, dpk, fi = x
                    return jax.vmap(fn)(st, im, dp, fi, img_pack=ipk,
                                        disp_pack=dpk)

                return jax.lax.scan(body, states,
                                    (imgs, disps, ipacks, dpacks, fids))

            self._step_packed_chunk = jax.jit(
                _chunk, static_argnames=('out_h', 'out_w', 'scale_factor'))
        self.states, results = self._step_packed_chunk(
            self.variables, self.states, imgs_u8, disps_u16, img_packs,
            disp_packs, jnp.asarray(frame_ids, jnp.int32), out_h=oh,
            out_w=ow, scale_factor=scale_factor)
        return results

    def track_raw_chunk(self, imgs_u8, disps_u16, frame_ids,
                        scale_factor: Tuple[float, float] = (1.0, 1.0)):
        """Advance all streams T frames in ONE device program.

        ``imgs_u8``: (T, S, H, W, 3) uint8; ``disps_u16``: (T, S, H, W)
        uint16; ``frame_ids``: (T, S). A ``lax.scan`` over the per-frame
        step carries the tracker states on-device — a production serving
        shape: per-program dispatch overhead (fixed cost per XLA launch;
        ~2.4 ms through the dev tunnel) is paid once per T frames instead
        of per frame. Returns FrameResults stacked on a leading T axis."""
        from ..models.preprocessor import padded_shape
        h, w = imgs_u8.shape[2], imgs_u8.shape[3]
        oh, ow = padded_shape(h, w)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(None, self.stream_axis))
            imgs_u8 = jax.device_put(imgs_u8, sh)
            disps_u16 = jax.device_put(disps_u16, sh)
        if not hasattr(self, '_step_raw_chunk'):
            def _chunk(variables, states, imgs, disps, fids, out_h, out_w,
                       scale_factor):
                fn = functools.partial(
                    predict_frame_raw, variables, self.module,
                    cfg=self.cfg, out_h=out_h, out_w=out_w,
                    scale_factor=scale_factor)

                def body(st, x):
                    im, dp, fi = x
                    return jax.vmap(fn)(st, im, dp, fi)

                return jax.lax.scan(body, states, (imgs, disps, fids))

            self._step_raw_chunk = jax.jit(
                _chunk, static_argnames=('out_h', 'out_w', 'scale_factor'))
        self.states, results = self._step_raw_chunk(
            self.variables, self.states, imgs_u8, disps_u16,
            jnp.asarray(frame_ids, jnp.int32), out_h=oh, out_w=ow,
            scale_factor=scale_factor)
        return results
