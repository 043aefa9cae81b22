"""Video object detectors: DFF, FGFA, SELSA (TPU-native).

Re-creates the reference's VID family:

* DFF   /root/reference/mmtrack/models/vid/dff.py — compute expensive
  backbone features only on key frames (every ``key_frame_interval``);
  non-key frames get the key features warped by FlowNetSimple flow.
* FGFA  /root/reference/mmtrack/models/vid/fgfa.py — warp a window of
  neighbor-frame features to the current frame and aggregate them with
  cosine-similarity embed weights
  (/root/reference/mmtrack/models/aggregators/embed_aggregator.py).
* SELSA /root/reference/mmtrack/models/vid/selsa.py — two-stage detection
  where the bbox head aggregates key-proposal features against reference
  -frame proposal features with multi-block attention.

TPU-first: each model is a functional step over a fixed-shape state
pytree (ring buffers instead of python deques; key-frame branching via
``jnp.where`` over both computed alternatives where cheap, or host-side
interval logic in the streaming wrapper — the per-frame jitted programs
stay static)."""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..two_stage import (FasterRCNN, TwoStageConfig, rcnn_predict,
                         rpn_proposals, standard_anchors)
from .flownet import FlowNetSimple, flow_warp_feats, prepare_flow_input


class EmbedAggregator(nn.Module):
    """Cosine-similarity adaptive weighting of warped neighbor features
    (embed_aggregator.py:40-88): x (1, H, W, C), ref_x (T, H, W, C).
    ``channels`` defaults to the input feature width (the reference's
    ConvModule(channels, channels) implies they are equal)."""
    channels: int = 0
    num_convs: int = 1
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ref_x, ref_valid=None):
        channels = self.channels or x.shape[-1]
        convs = [nn.Conv(channels,
                         (self.kernel_size, self.kernel_size),
                         padding=self.kernel_size // 2,
                         use_bias=i == self.num_convs - 1,
                         dtype=self.dtype, name=f'embed{i}')
                 for i in range(self.num_convs)]

        def embed(v):
            for i, conv in enumerate(convs):
                v = conv(v)
                if i != self.num_convs - 1:
                    v = nn.relu(v)
            return v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

        x_e = embed(x)                               # (1, H, W, C)
        ref_e = embed(ref_x)                         # (T, H, W, C)
        w = (ref_e * x_e).sum(-1, keepdims=True)     # (T, H, W, 1)
        if ref_valid is not None:
            w = jnp.where(ref_valid[:, None, None, None], w, -1e9)
        w = jax.nn.softmax(w, axis=0)
        return (ref_x * w).sum(axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# DFF
# ---------------------------------------------------------------------------

class DFFState(NamedTuple):
    key_img: jnp.ndarray        # (1, H, W, 3) raw RGB of the key frame
    key_feat: jnp.ndarray       # (1, Hf, Wf, C)


class DFF:
    """Streaming DFF detector. ``detector`` is a FasterRCNN module +
    variables; flow model shares the variables dict under 'flownet'."""

    def __init__(self, variables, cfg: TwoStageConfig = TwoStageConfig(),
                 key_frame_interval: int = 10, dtype=jnp.float32):
        self.cfg = cfg
        self.interval = key_frame_interval
        self.det = FasterRCNN(cfg, dtype=dtype)
        self.flow = FlowNetSimple(dtype=dtype)
        self.variables = variables
        self._extract = jax.jit(self._extract_impl)
        self._warp = jax.jit(self._warp_impl)
        self._detect = jax.jit(self._detect_impl,
                               static_argnames=('img_shape',))

    def _extract_impl(self, img):
        return self.det.apply(self.variables['detector'], img,
                              method=FasterRCNN.extract_feat)

    def _warp_impl(self, img, state: DFFState):
        pair = prepare_flow_input(img, state.key_img)
        flow = self.flow.apply(self.variables['flownet'], pair)
        return flow_warp_feats(state.key_feat, flow)

    def _detect_impl(self, feat, img_shape):
        cls, reg = self.det.apply(self.variables['detector'], feat,
                                  method=FasterRCNN.rpn)
        h, w = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(standard_anchors(
            h, w, self.cfg.stride, self.cfg.anchor_scales,
            self.cfg.anchor_ratios))
        rois, _, valid = rpn_proposals(cls[0], reg[0], anchors, img_shape,
                                       self.cfg)
        rf = self.det.apply(self.variables['detector'], feat[0], rois,
                            method=FasterRCNN.roi_feats)
        ccls, creg, _ = self.det.apply(self.variables['detector'], rf,
                                       method=FasterRCNN.roi_forward)
        return rcnn_predict(ccls, creg, rois, valid, img_shape, self.cfg)

    def detect(self, img, frame_id: int, state: Optional[DFFState] = None):
        """img (1, H, W, 3) RGB float. Returns (state, NMSResult)."""
        img = jnp.asarray(img, jnp.float32)
        if frame_id % self.interval == 0 or state is None:
            feat = self._extract(img)
            state = DFFState(img, feat)
        else:
            feat = self._warp(img, state)
        res = self._detect(feat, (img.shape[1], img.shape[2]))
        return state, res


# ---------------------------------------------------------------------------
# FGFA
# ---------------------------------------------------------------------------

class FGFAState(NamedTuple):
    imgs: jnp.ndarray           # (T, H, W, 3) ring buffer of raw frames
    feats: jnp.ndarray          # (T, Hf, Wf, C)
    valid: jnp.ndarray          # (T,)
    ptr: jnp.ndarray            # ()


class FGFA:
    """Streaming FGFA: aggregate the ring buffer of neighbor features,
    each warped to the current frame (fgfa.py test path)."""

    def __init__(self, variables, cfg: TwoStageConfig = TwoStageConfig(),
                 window: int = 9, dtype=jnp.float32):
        self.cfg = cfg
        self.window = window
        self.det = FasterRCNN(cfg, dtype=dtype)
        self.flow = FlowNetSimple(dtype=dtype)
        self.agg = EmbedAggregator(dtype=dtype)
        self.variables = variables
        self._extract = jax.jit(self._extract_impl)
        self._step = jax.jit(self._step_impl,
                             static_argnames=('img_shape',))

    def _extract_impl(self, img):
        return self.det.apply(self.variables['detector'], img,
                              method=FasterRCNN.extract_feat)

    def init_state(self, img_shape: Tuple[int, int],
                   feat_shape: Tuple[int, int, int]) -> FGFAState:
        t = self.window
        h, w = img_shape
        fh, fw, fc = feat_shape
        return FGFAState(jnp.zeros((t, h, w, 3)),
                         jnp.zeros((t, fh, fw, fc)),
                         jnp.zeros((t,), bool), jnp.zeros((), jnp.int32))

    def _step_impl(self, img, state: FGFAState, img_shape):
        feat = self._extract_impl(img)
        imgs = state.imgs.at[state.ptr].set(img[0])
        feats = state.feats.at[state.ptr].set(feat[0])
        valid = state.valid.at[state.ptr].set(True)
        ptr = jnp.mod(state.ptr + 1, self.window)
        new_state = FGFAState(imgs, feats, valid, ptr)

        # warp every buffered frame's features to the current frame
        def warp_one(ref_img, ref_feat):
            pair = prepare_flow_input(img, ref_img[None])
            flow = self.flow.apply(self.variables['flownet'], pair)
            return flow_warp_feats(ref_feat[None], flow)[0]

        warped = jax.vmap(warp_one)(imgs, feats)       # (T, Hf, Wf, C)
        agg = self.agg.apply(self.variables['aggregator'], feat, warped,
                             valid)

        cls, reg = self.det.apply(self.variables['detector'], agg,
                                  method=FasterRCNN.rpn)
        h, w = agg.shape[1], agg.shape[2]
        anchors = jnp.asarray(standard_anchors(
            h, w, self.cfg.stride, self.cfg.anchor_scales,
            self.cfg.anchor_ratios))
        rois, _, rvalid = rpn_proposals(cls[0], reg[0], anchors, img_shape,
                                        self.cfg)
        rf = self.det.apply(self.variables['detector'], agg[0], rois,
                            method=FasterRCNN.roi_feats)
        ccls, creg, _ = self.det.apply(self.variables['detector'], rf,
                                       method=FasterRCNN.roi_forward)
        res = rcnn_predict(ccls, creg, rois, rvalid, img_shape, self.cfg)
        return new_state, res

    def detect(self, img, frame_id: int, state: Optional[FGFAState] = None):
        img = jnp.asarray(img, jnp.float32)
        if state is None or frame_id == 0:
            feat_shape = jax.eval_shape(self._extract, img).shape
            state = self.init_state((img.shape[1], img.shape[2]),
                                    feat_shape[1:])
        return self._step(img, state, (img.shape[1], img.shape[2]))


# ---------------------------------------------------------------------------
# SELSA
# ---------------------------------------------------------------------------

class SELSA:
    """Streaming SELSA: key-frame detection with bbox-head attention over
    reference-frame proposal features (selsa.py predict path; refs are a
    ring of recent frames)."""

    def __init__(self, variables, cfg: TwoStageConfig = TwoStageConfig(),
                 num_refs: int = 2, dtype=jnp.float32):
        self.cfg = cfg
        self.num_refs = num_refs
        self.det = FasterRCNN(cfg, selsa=True, dtype=dtype)
        self.variables = variables
        self._step = jax.jit(self._step_impl,
                             static_argnames=('img_shape',))

    def _proposal_feats(self, feat, img_shape):
        cls, reg = self.det.apply(self.variables, feat,
                                  method=FasterRCNN.rpn)
        h, w = feat.shape[1], feat.shape[2]
        anchors = jnp.asarray(standard_anchors(
            h, w, self.cfg.stride, self.cfg.anchor_scales,
            self.cfg.anchor_ratios))
        rois, _, valid = rpn_proposals(cls[0], reg[0], anchors, img_shape,
                                       self.cfg)
        rf = self.det.apply(self.variables, feat[0], rois,
                            method=FasterRCNN.roi_feats)
        return rois, valid, rf

    def _step_impl(self, img, ref_imgs, img_shape):
        feat = self.det.apply(self.variables, img,
                              method=FasterRCNN.extract_feat)
        rois, valid, rf = self._proposal_feats(feat, img_shape)

        ref_feats = [self.det.apply(self.variables, r[None],
                                    method=FasterRCNN.extract_feat)
                     for r in ref_imgs]
        ref_rf, ref_valid = [], []
        for f in ref_feats:
            _, v, rfeat = self._proposal_feats(f, img_shape)
            ref_rf.append(rfeat)
            ref_valid.append(v)
        ref_rf = jnp.concatenate(ref_rf, 0)
        ref_valid = jnp.concatenate(ref_valid, 0)

        ccls, creg, _ = self.det.apply(
            self.variables, rf, ref_rf, ref_valid,
            method=FasterRCNN.roi_forward_selsa)
        return rcnn_predict(ccls, creg, rois, valid, img_shape, self.cfg)

    def detect(self, img, ref_imgs):
        """img (1, H, W, 3); ref_imgs (R, H, W, 3) reference frames."""
        img = jnp.asarray(img, jnp.float32)
        ref_imgs = jnp.asarray(ref_imgs, jnp.float32)
        return self._step(img, ref_imgs, (img.shape[1], img.shape[2]))
