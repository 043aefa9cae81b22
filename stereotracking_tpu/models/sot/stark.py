"""STARK spatio-temporal transformer tracker, TPU-native (JAX/Flax).

Re-creates the behavior of the reference Stark stack:

* model orchestration  /root/reference/mmtrack/models/sot/stark.py
  (template + dynamic-template memory, zero-padded crops with padding
  masks, score-gated template update every ``update_interval`` frames)
* head                 /root/reference/mmtrack/models/track_heads/
  stark_head.py (DETR encoder/decoder over the concatenated flattened
  template+search sequence, decoder-attention-reweighted search features
  into a corner-heatmap soft-argmax box head, MLP score head)

TPU-first design: batch-first (N, L, C) sequences, fixed lengths
(2 * 8*8 + 20*20 = 528 tokens for the canonical 128/320 crops), the whole
track step one jitted program; the data-dependent dynamic-template update
is a ``jnp.where`` over the recomputed template features, not a host
branch.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..resnet import ResNet


class StarkTestCfg(NamedTuple):
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 5.0
    search_size: int = 320
    num_templates: int = 2
    update_interval: int = 200
    update_score_thr: float = 0.5


# ---------------------------------------------------------------------------
# crop with zero padding + padding mask (stark.py:104-176 semantics)
# ---------------------------------------------------------------------------

def stark_crop(img: jnp.ndarray, bbox_cxcywh: jnp.ndarray, factor: float,
               out_size: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Crop ``factor * sqrt(w*h)`` square around the box center, zero-pad
    outside the image, resize to ``out_size`` (bilinear,
    align_corners=False). Returns (crop (S, S, C), resize_factor,
    padding_mask (S, S) in [0, 1]).

    Replicates the reference's integer bounds: x1 = round(cx - size/2),
    window [x1, x1 + size); when the window overruns the right/bottom edge
    the last image row/column is treated as padding too
    (stark.py:141-147's ``x2 - img_w + 1`` crop bound)."""
    h, w, _ = img.shape
    cx, cy, bw, bh = (bbox_cxcywh[0], bbox_cxcywh[1], bbox_cxcywh[2],
                      bbox_cxcywh[3])
    crop_size = jnp.ceil(jnp.sqrt(bw * bh) * factor)
    crop_size = jnp.maximum(crop_size, 1.0)
    x1 = jnp.round(cx - crop_size * 0.5)
    y1 = jnp.round(cy - crop_size * 0.5)
    x2 = x1 + crop_size
    y2 = y1 + crop_size
    hi_x = jnp.where(x2 > w - 1, w - 1, x2)
    hi_y = jnp.where(y2 > h - 1, h - 1, y2)

    def axis_pos(lo, size):
        scale = size / out_size
        pos = lo + (jnp.arange(out_size) + 0.5) * scale - 0.5
        return jnp.clip(pos, lo, lo + size - 1.0)

    def gather(arr, pos, lo_valid, hi_valid, axis_len, axis):
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = (pos - i0)[(...,) + (None,) * (arr.ndim - 1)]
        i1 = i0 + 1

        def fetch(idx):
            valid = (idx >= lo_valid) & (idx < hi_valid) \
                & (idx >= 0) & (idx < axis_len)
            v = jnp.take(arr, jnp.clip(idx, 0, axis_len - 1), axis=axis)
            m = valid[(...,) + (None,) * (arr.ndim - 1)]
            return jnp.where(m, v, 0.0), m.astype(jnp.float32)

        v0, m0 = fetch(i0)
        v1, m1 = fetch(i1)
        return v0 * (1 - frac) + v1 * frac, m0 * (1 - frac) + m1 * frac

    ys = axis_pos(y1, crop_size)
    xs = axis_pos(x1, crop_size)
    rows, rmask = gather(img, ys, 0, hi_y, h, 0)
    crop, cmask = gather(rows.transpose(1, 0, 2), xs, 0, hi_x, w, 0)
    crop = crop.transpose(1, 0, 2)
    # separable validity: rmask/cmask are (out, 1, 1) per-axis weights
    valid = rmask.reshape(out_size)[:, None] * cmask.reshape(out_size)[None]
    padding_mask = 1.0 - valid
    resize_factor = out_size / crop_size
    return crop, resize_factor, padding_mask


# ---------------------------------------------------------------------------
# DETR transformer pieces (stark_head.py:180-265; mmdet DETR semantics)
# ---------------------------------------------------------------------------

def sine_positional_encoding(mask: jnp.ndarray, num_feats: int = 128,
                             temperature: float = 10000.0,
                             eps: float = 1e-6) -> jnp.ndarray:
    """mmdet SinePositionalEncoding(normalize=True) from a (N, H, W)
    padding mask (1 = padded). Returns (N, H, W, 2 * num_feats)."""
    not_mask = 1.0 - mask
    y = jnp.cumsum(not_mask, axis=1)
    x = jnp.cumsum(not_mask, axis=2)
    scale = 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], axis=4)
    pos_x = pos_x.reshape(*pos_x.shape[:3], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], axis=4)
    pos_y = pos_y.reshape(*pos_y.shape[:3], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class _FFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, dtype=self.dtype, name='fc1')(x)
        h = nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name='fc2')(h)


class _EncoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, attn_mask):
        q = k = x + pos
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='attn')(
                q, k, x, mask=attn_mask)
        x = nn.LayerNorm(dtype=self.dtype, name='norm1')(x + a)
        f = _FFN(self.dim, self.ffn, dtype=self.dtype, name='ffn')(x)
        return nn.LayerNorm(dtype=self.dtype, name='norm2')(x + f)


class _DecoderLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, qpos, mem, mpos, attn_mask):
        q = k = tgt + qpos
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='self_attn')(
                q, k, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name='norm1')(tgt + a)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='cross_attn')(
                tgt + qpos, mem + mpos, mem, mask=attn_mask)
        tgt = nn.LayerNorm(dtype=self.dtype, name='norm2')(tgt + a)
        f = _FFN(self.dim, self.ffn, dtype=self.dtype, name='ffn')(tgt)
        return nn.LayerNorm(dtype=self.dtype, name='norm3')(tgt + f)


class StarkTransformer(nn.Module):
    """Post-norm DETR encoder/decoder, batch-first (N, L, C)."""
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    num_layers: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, query_embed, pos_embed):
        # attend where key is NOT padded: (N, 1, 1, L) broadcast mask
        attn_mask = (pad_mask < 0.5)[:, None, None, :]
        mem = x
        for i in range(self.num_layers):
            mem = _EncoderLayer(self.dim, self.heads, self.ffn,
                                dtype=self.dtype,
                                name=f'enc{i}')(mem, pos_embed, attn_mask)
        n = x.shape[0]
        qpos = jnp.broadcast_to(query_embed[None], (n,) + query_embed.shape)
        tgt = jnp.zeros_like(qpos)
        for i in range(self.num_layers):
            tgt = _DecoderLayer(self.dim, self.heads, self.ffn,
                                dtype=self.dtype,
                                name=f'dec{i}')(tgt, qpos, mem, pos_embed,
                                                attn_mask)
        # mmdet DetrTransformerDecoder(return_intermediate=False) applies a
        # final LN (post_norm) on top of the last layer's norm3.
        tgt = nn.LayerNorm(dtype=self.dtype, name='post_norm')(tgt)
        return tgt, mem


class CornerPredictorHead(nn.Module):
    """Corner heatmaps + soft-argmax (stark_head.py:19-126)."""
    channel: int = 256
    feat_size: int = 20
    stride: int = 16
    dtype: Any = jnp.float32

    def _branch(self, x, name, train):
        c = self.channel
        for i, ch in enumerate([c, c // 2, c // 4, c // 8]):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f'{name}_conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'{name}_bn{i}')(x)
            x = nn.relu(x)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name=f'{name}_out')(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = self._branch(x, 'tl', train)[..., 0]
        br = self._branch(x, 'br', train)[..., 0]

        f = self.feat_size
        coord = jnp.arange(f, dtype=jnp.float32) * self.stride

        def soft_argmax(score):
            prob = jax.nn.softmax(score.reshape(score.shape[0], -1), -1)
            prob = prob.reshape(score.shape[0], f, f)
            sx = (prob.sum(axis=1) * coord).sum(-1)
            sy = (prob.sum(axis=2) * coord).sum(-1)
            return sx, sy

        x1, y1 = soft_argmax(tl)
        x2, y2 = soft_argmax(br)
        return jnp.stack([x1, y1, x2, y2], -1)


class ScoreHead(nn.Module):
    """3-layer MLP confidence head (stark_head.py:129-177)."""
    hidden: int = 256
    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype,
                                 name=f'fc{i}')(x))
        return nn.Dense(1, dtype=self.dtype,
                        name=f'fc{self.num_layers - 1}')(x)


class StarkHead(nn.Module):
    """Merge templates + search, run the transformer, predict corners and
    confidence (stark_head.py:267-491)."""
    z_feat_size: int = 8
    x_feat_size: int = 20
    stride: int = 16
    dim: int = 256
    num_query: int = 1
    num_layers: int = 6
    with_cls_head: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, masks, train: bool = False,
                 skip_bbox: bool = False, skip_cls: bool = False):
        """``feats``: list of (N, H, W, C) template(s)+search (search LAST);
        ``masks``: list of (N, H, W) float image-crop padding masks
        (resized to feature size with nearest interpolation here)."""
        seqs, pads, poss = [], [], []
        for f, m in zip(feats, masks):
            n, hh, ww, c = f.shape
            m_feat = jax.image.resize(m, (m.shape[0], hh, ww), 'nearest')
            m_feat = (m_feat > 0).astype(jnp.float32)
            pos = sine_positional_encoding(m_feat, self.dim // 2)
            seqs.append(f.reshape(n, hh * ww, c))
            pads.append(m_feat.reshape(n, hh * ww))
            poss.append(pos.reshape(n, hh * ww, self.dim))
        seq = jnp.concatenate(seqs, axis=1)
        pad = jnp.concatenate(pads, axis=1)
        pos = jnp.concatenate(poss, axis=1)

        query_embed = self.param(
            'query_embed', nn.initializers.normal(1.0),
            (self.num_query, self.dim))
        out_dec, enc_mem = StarkTransformer(
            self.dim, num_layers=self.num_layers, dtype=self.dtype,
            name='transformer')(seq, pad, query_embed, pos)

        logits = None
        if self.with_cls_head and not skip_cls:
            logits = ScoreHead(self.dim, dtype=self.dtype,
                               name='cls_head')(out_dec)   # (N, Q, 1)
        bboxes = None
        if not skip_bbox:
            # attention-reweighted search features -> corner head
            # (stark_head.py:400-434)
            x_len = self.x_feat_size ** 2
            x_feat = enc_mem[:, -x_len:, :]                 # (N, HW, C)
            att = jnp.einsum('nlc,nqc->nlq', x_feat, out_dec)
            bf = x_feat[..., None] * att[:, :, None, :]     # (N, HW, C, Q)
            n = bf.shape[0]
            bf = bf.transpose(0, 3, 1, 2).reshape(
                n * self.num_query, self.x_feat_size, self.x_feat_size,
                self.dim)
            bboxes = CornerPredictorHead(
                self.dim, self.x_feat_size, self.stride, dtype=self.dtype,
                name='bbox_head')(bf, train)                # (N*Q, 4)
        return logits, bboxes


class StarkModule(nn.Module):
    """backbone(stage-3) -> 1x1 input projection -> StarkHead."""
    cfg: StarkTestCfg = StarkTestCfg()
    # tiny-config knobs (default = canonical r50 + 6-layer transformer)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    head_layers: int = 6
    dtype: Any = jnp.float32

    def setup(self):
        # reference Stark backbone: ResNet-50 num_stages=3, out stage 3
        # (no layer4 in the checkpoints)
        self.backbone = ResNet(num_stages=3, strides=(1, 2, 2),
                               dilations=(1, 1, 1), out_indices=(2,),
                               stage_blocks=self.stage_blocks,
                               base_width=self.base_width,
                               dtype=self.dtype)
        self.input_proj = nn.Conv(256, (1, 1), dtype=self.dtype,
                                  name='input_proj')
        s = self.cfg
        self.head = StarkHead(z_feat_size=s.template_size // 16,
                              x_feat_size=s.search_size // 16,
                              num_layers=self.head_layers,
                              dtype=self.dtype)

    def extract_feat(self, img, train: bool = False):
        (f,) = self.backbone(img, train)
        return self.input_proj(f)

    def forward_head(self, feats, masks, train: bool = False,
                     skip_bbox: bool = False, skip_cls: bool = False):
        return self.head(feats, masks, train, skip_bbox, skip_cls)

    def __call__(self, z_imgs, z_masks, x_img, x_mask, train: bool = False):
        feats = [self.extract_feat(z, train) for z in z_imgs]
        feats.append(self.extract_feat(x_img, train))
        return self.head(feats, list(z_masks) + [x_mask], train)


class StarkState(NamedTuple):
    bbox: jnp.ndarray                     # (4,) cxcywh, original image
    z_feats: jnp.ndarray                  # (T, zf, zf, 256)
    z_masks: jnp.ndarray                  # (T, z_size, z_size)
    frame_id: jnp.ndarray                 # ()


class StarkTracker:
    """Jitted init/track with in-graph dynamic-template update
    (stark.py:178-253)."""

    def __init__(self, variables, cfg: StarkTestCfg = StarkTestCfg(),
                 dtype=jnp.float32, module: Optional[StarkModule] = None):
        self.cfg = cfg
        self.module = module or StarkModule(cfg, dtype=dtype)
        self.variables = variables
        self._init = jax.jit(self._init_impl)
        self._track = jax.jit(self._track_impl)

    def init(self, img, bbox_xyxy):
        img = jnp.asarray(img, jnp.float32)
        b = jnp.asarray(bbox_xyxy, jnp.float32)
        cxcywh = jnp.stack([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2,
                            b[2] - b[0], b[3] - b[1]])
        return self._init(img, cxcywh)

    def track(self, img, state: StarkState):
        return self._track(jnp.asarray(img, jnp.float32), state)

    def _template(self, img, bbox):
        crop, _, mask = stark_crop(img, bbox, self.cfg.template_factor,
                                   self.cfg.template_size)
        feat = self.module.apply(self.variables, crop[None],
                                 method=StarkModule.extract_feat)
        return feat[0], mask

    def _init_impl(self, img, bbox):
        zf, zm = self._template(img, bbox)
        t = self.cfg.num_templates
        return StarkState(bbox,
                          jnp.tile(zf[None], (t, 1, 1, 1)),
                          jnp.tile(zm[None], (t, 1, 1)),
                          jnp.zeros((), jnp.int32))

    def _track_impl(self, img, state: StarkState):
        cfg = self.cfg
        frame_id = state.frame_id + 1
        crop, rf, xmask = stark_crop(img, state.bbox, cfg.search_factor,
                                     cfg.search_size)
        x_feat = self.module.apply(self.variables, crop[None],
                                   method=StarkModule.extract_feat)
        feats = [state.z_feats[i][None] for i in range(cfg.num_templates)]
        feats.append(x_feat)
        masks = [state.z_masks[i][None] for i in range(cfg.num_templates)]
        masks.append(xmask[None])
        logits, bboxes = self.module.apply(
            self.variables, feats, masks, method=StarkModule.forward_head)
        score = jax.nn.sigmoid(logits.reshape(-1))[0]

        # map crop box back to image coords (stark_head.py:597-625)
        pred = bboxes.mean(axis=0) / rf
        half = 0.5 * cfg.search_size / rf
        shift = jnp.stack([state.bbox[0] - half, state.bbox[1] - half,
                           state.bbox[0] - half, state.bbox[1] - half])
        pred = pred + shift
        h_img, w_img = img.shape[0], img.shape[1]
        margin = 10.0
        x1 = jnp.clip(pred[0], 0, w_img - margin)
        y1 = jnp.clip(pred[1], 0, h_img - margin)
        bw = jnp.clip(pred[2] - pred[0], margin, w_img)
        bh = jnp.clip(pred[3] - pred[1], margin, h_img)
        out_xyxy = jnp.stack([x1, y1, x1 + bw, y1 + bh])
        new_bbox = jnp.stack([x1 + bw / 2, y1 + bh / 2, bw, bh])

        # dynamic template update (stark.py:200-219): recompute the template
        # at the new box; keep it only when due and confident.
        zf_new, zm_new = self._template(img, new_bbox)
        due = (jnp.mod(frame_id, cfg.update_interval) == 0) \
            & (score > cfg.update_score_thr)
        z_feats = state.z_feats.at[1].set(
            jnp.where(due, zf_new, state.z_feats[1]))
        z_masks = state.z_masks.at[1].set(
            jnp.where(due, zm_new, state.z_masks[1]))
        new_state = StarkState(new_bbox, z_feats, z_masks, frame_id)
        return new_state, (out_xyxy, score)


# ---------------------------------------------------------------------------
# training losses (stark_head.py:686-748)
# ---------------------------------------------------------------------------

def giou_loss(pred: jnp.ndarray, gt: jnp.ndarray, eps=1e-7) -> jnp.ndarray:
    lt = jnp.maximum(pred[:, :2], gt[:, :2])
    rb = jnp.minimum(pred[:, 2:], gt[:, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    ap = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
    ag = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = ap + ag - inter + eps
    iou = inter / union
    elt = jnp.minimum(pred[:, :2], gt[:, :2])
    erb = jnp.maximum(pred[:, 2:], gt[:, 2:])
    ewh = jnp.clip(erb - elt, 0, None)
    enclose = ewh[:, 0] * ewh[:, 1] + eps
    giou = iou - (enclose - union) / enclose
    return (1 - giou).mean()


def stark_stage1_loss(pred_bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                      search_size: int, iou_weight: float = 2.0,
                      l1_weight: float = 5.0) -> dict:
    """GIoU + L1 on normalized boxes (stage-1; stark_head.py:715-736)."""
    p = pred_bboxes / search_size
    g = jnp.clip(gt_bboxes / search_size, 0., 1.)
    degenerate = ((p[:, :2] >= p[:, 2:]).any()
                  | (g[:, :2] >= g[:, 2:]).any())
    loss_iou = jnp.where(degenerate, 0.0, giou_loss(p, g)) * iou_weight
    loss_bbox = jnp.abs(p - g).mean() * l1_weight
    return {'loss_iou': loss_iou, 'loss_bbox': loss_bbox}


def stark_stage2_loss(pred_logits: jnp.ndarray,
                      gt_labels: jnp.ndarray) -> dict:
    """BCE confidence loss (stage-2; stark_head.py:737-748)."""
    x = pred_logits.reshape(-1)
    y = gt_labels.reshape(-1).astype(jnp.float32)
    loss = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return {'loss_cls': loss.mean()}
