"""Mask2Former for video instance segmentation, TPU-native.

Re-creates the reference stack:

* model /root/reference/mmtrack/models/vis/mask2former.py (backbone ->
  track head; per-video queries give identities for free)
* head  /root/reference/mmtrack/models/track_heads/mask2former_head.py
  (pixel decoder -> 100 learnable queries, 9 masked-attention decoder
  layers cycling over 3 feature levels, per-layer class + mask-embedding
  heads, spatio-temporal mask prediction via einsum over (T, H, W) mask
  features, all-background attention masks reset to attend-everywhere)

The pixel decoder is the exact MSDeformAttn form (mmdet
MSDeformAttnPixelDecoder: 6-layer multi-scale deformable-attention encoder
over strides 8/16/32 + stride-4 lateral, the mmcv CUDA kernel re-derived as
vectorized bilinear gathers); ``PixelDecoderFPN`` remains available as a
cheaper option.  Training match costs and mask losses use mmdet's point
sampling (uniform 12544-point match costs; uncertainty-importance-sampled
loss points, oversample 3.0 / importance 0.75) — ``point_sample`` /
``uncertain_point_coords`` below.
"""
from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.assignment import linear_assignment_with_limit
from ..resnet import ResNet
from ..sot.stark import sine_positional_encoding


class Mask2FormerConfig(NamedTuple):
    num_classes: int = 40          # YouTube-VIS 2019
    num_queries: int = 100
    embed_dim: int = 256
    num_heads: int = 8
    num_decoder_layers: int = 9
    num_feat_levels: int = 3
    ffn_dim: int = 2048
    pixel_decoder: str = 'msdeform'   # exact reference form | 'fpn'
    pixel_decoder_layers: int = 6
    # training point sampling (mask2former_head.py:151-153)
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    # predict
    max_per_video: int = 10
    score_thr: float = 0.0
    # tiny-config backbone knobs (None/64 = canonical r50)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    # reference builds decoder input projs only when embed dims differ
    # (mask2former_head.py:122-131); canonical configs use Identity
    enforce_decoder_input_project: bool = False


def sine_positional_encoding_3d(t: int, h: int, w: int, num_feats: int,
                                temperature: float = 10000.0,
                                eps: float = 1e-6) -> jnp.ndarray:
    """mmtrack SinePositionalEncoding3D(normalize=True) for an all-valid
    (T, H, W) volume (layers/positional_encoding.py:61-117): the 2D DETR
    encoding cat(pos_y, pos_x) plus a temporal sine term pos_z computed
    over 2*num_feats dims.  Returns (T, H, W, 2 * num_feats)."""
    import math
    scale = 2 * math.pi
    z = (jnp.arange(1, t + 1, dtype=jnp.float32) / (t + eps) * scale)
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + eps) * scale)
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + eps) * scale)

    def enc(v, nf):
        dim_t = temperature ** (2 * (jnp.arange(nf) // 2) / nf)
        p = v[:, None] / dim_t
        return jnp.stack([jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])],
                         axis=2).reshape(v.shape[0], -1)

    pos_y = enc(y, num_feats)                       # (H, C/2)
    pos_x = enc(x, num_feats)                       # (W, C/2)
    pos_z = enc(z, num_feats * 2)                   # (T, C)
    pos2d = jnp.concatenate([
        jnp.broadcast_to(pos_y[:, None, :], (h, w, num_feats)),
        jnp.broadcast_to(pos_x[None, :, :], (h, w, num_feats))], -1)
    return pos2d[None] + pos_z[:, None, None, :]


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (mmcv MultiScaleDeformableAttention
    semantics re-derived for XLA): each query samples ``num_points``
    bilinear taps per head per level at learned offsets around its
    reference point and mixes them with a learned softmax weighting.

    ``__call__(query (N, L, C), value (N, L, C), ref (L, 2) normalized
    (x, y), shapes [(H, W), ...])``; ``L = sum(H*W)``.
    """
    dim: int = 256
    heads: int = 8
    levels: int = 3
    points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value, ref, shapes):
        n, l, c = query.shape
        h, lv, p = self.heads, self.levels, self.points
        hd = c // h
        v = nn.Dense(c, dtype=self.dtype, name='value_proj')(value)
        off = nn.Dense(h * lv * p * 2, dtype=self.dtype,
                       name='sampling_offsets')(query)
        off = off.reshape(n, l, h, lv, p, 2)
        aw = nn.Dense(h * lv * p, dtype=self.dtype,
                      name='attention_weights')(query)
        aw = jax.nn.softmax(aw.reshape(n, l, h, lv * p), -1)
        aw = aw.reshape(n, l, h, lv, p)

        # split value tokens back into per-level maps
        sizes = [hh * ww for hh, ww in shapes]
        starts = np.concatenate([[0], np.cumsum(sizes)])
        out = jnp.zeros((n, l, h, hd), self.dtype)
        for li, (hh, ww) in enumerate(shapes):
            vm = v[:, starts[li]:starts[li + 1]].reshape(n, hh, ww, h, hd)
            # sampling locations normalized -> pixel coords
            # (align_corners=False grid_sample mapping, zeros padding)
            loc = ref[None, :, None, None, :] + \
                off[:, :, :, li] / jnp.asarray([ww, hh], self.dtype)
            x = loc[..., 0] * ww - 0.5                  # (N, L, h, p)
            y = loc[..., 1] * hh - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            fx = (x - x0)[..., None]
            fy = (y - y0)[..., None]
            acc = 0.0
            for dy, dx, wgt in ((0, 0, (1 - fy) * (1 - fx)),
                                (0, 1, (1 - fy) * fx),
                                (1, 0, fy * (1 - fx)),
                                (1, 1, fy * fx)):
                gx = x0 + dx
                gy = y0 + dy
                inb = ((gx >= 0) & (gx < ww) & (gy >= 0)
                       & (gy < hh))[..., None]
                gxc = jnp.clip(gx, 0, ww - 1).astype(jnp.int32)
                gyc = jnp.clip(gy, 0, hh - 1).astype(jnp.int32)
                # gather (N, L, h, p, hd): per-head maps indexed at
                # (gyc, gxc); head axis aligned via arange
                hi = jnp.arange(h)[None, None, :, None]
                tap = vm[jnp.arange(n)[:, None, None, None], gyc, gxc, hi]
                acc = acc + jnp.where(inb, wgt, 0.0) * tap
            out = out + (acc * aw[:, :, :, li, :, None]).sum(3)
        out = out.reshape(n, l, c)
        return nn.Dense(c, dtype=self.dtype, name='output_proj')(out)


class _EncoderLayer(nn.Module):
    """Deformable encoder layer (post-norm: attn -> LN -> FFN -> LN)."""
    dim: int = 256
    heads: int = 8
    levels: int = 3
    points: int = 4
    ffn: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos, ref, shapes):
        a = MSDeformAttn(self.dim, self.heads, self.levels, self.points,
                         dtype=self.dtype, name='attn')(x + pos, x, ref,
                                                        shapes)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x + a)
        f = nn.Dense(self.ffn, dtype=self.dtype, name='ffn1')(x)
        f = nn.Dense(self.dim, dtype=self.dtype, name='ffn2')(nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x + f)


class MSDeformAttnPixelDecoder(nn.Module):
    """Exact-form pixel decoder (mmdet MSDeformAttnPixelDecoder): 1x1+GN
    input projections of strides 32/16/8, a 6-layer deformable-attention
    encoder over the concatenated tokens, then a stride-4 lateral +
    top-down step; returns (mask_features stride 4,
    [memory stride 32, 16, 8])."""
    dim: int = 256
    num_layers: int = 6
    ffn: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        # feats: stride 4, 8, 16, 32 — encoder levels are 32, 16, 8
        enc_feats = [feats[3], feats[2], feats[1]]
        n = feats[0].shape[0]
        level_embed = self.param('level_embed',
                                 nn.initializers.normal(1.0),
                                 (3, self.dim))
        tokens, poss, shapes, refs = [], [], [], []
        for i, f in enumerate(enc_feats):
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                        name=f'input_conv{i}')(f)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f'input_gn{i}')(x)
            hh, ww = x.shape[1], x.shape[2]
            pos = sine_positional_encoding(jnp.zeros((n, hh, ww)),
                                           self.dim // 2)
            tokens.append(x.reshape(n, hh * ww, self.dim))
            poss.append(pos.reshape(n, hh * ww, self.dim)
                        + level_embed[i])
            shapes.append((hh, ww))
            ys, xs = jnp.meshgrid(
                (jnp.arange(hh, dtype=self.dtype) + 0.5) / hh,
                (jnp.arange(ww, dtype=self.dtype) + 0.5) / ww,
                indexing='ij')
            refs.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1))
        x = jnp.concatenate(tokens, axis=1)
        pos = jnp.concatenate(poss, axis=1)
        ref = jnp.concatenate(refs, axis=0)              # (L, 2) (x, y)
        for i in range(self.num_layers):
            x = _EncoderLayer(self.dim, 8, 3, 4, self.ffn,
                              dtype=self.dtype,
                              name=f'layer{i}')(x, pos, ref, shapes)
        sizes = [hh * ww for hh, ww in shapes]
        starts = np.concatenate([[0], np.cumsum(sizes)])
        memories = [x[:, starts[i]:starts[i + 1]].reshape(
            n, shapes[i][0], shapes[i][1], self.dim) for i in range(3)]

        # stride-4 lateral + top-down from the stride-8 encoder output
        # (ConvModule(bias=False) before GN, mask_feature is a 1x1 conv —
        # mmdet MSDeformAttnPixelDecoder / detectron2 msdeformattn.py)
        lat = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                      name='lateral4')(feats[0])
        lat = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                           name='lateral4_gn')(lat)
        up = jax.image.resize(memories[2], lat.shape, 'bilinear')
        y = nn.Conv(self.dim, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name='output4')(lat + up)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 dtype=self.dtype, name='output4_gn')(y))
        mask_features = nn.Conv(self.dim, (1, 1),
                                dtype=self.dtype, name='mask_feat')(y)
        return mask_features, memories


class PixelDecoderFPN(nn.Module):
    """FPN pixel decoder (MaskFormer form): returns (mask_features at
    stride 4, [memory stride 32, 16, 8])."""
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        # feats: stride 4, 8, 16, 32
        laterals = [nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                            name=f'lateral{i}')(f)
                    for i, f in enumerate(feats)]
        outs = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = outs[-1]
            n, h, w, c = laterals[i].shape
            up = jax.image.resize(up, (n, h, w, c), 'nearest')
            x = laterals[i] + up
            x = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype,
                        name=f'smooth{i}')(x)
            outs.append(x)
        # outs: stride 32, 16, 8, 4
        mask_features = nn.Conv(self.dim, (3, 3), padding=1,
                                dtype=self.dtype,
                                name='mask_feat')(outs[-1])
        return mask_features, outs[:3]


class _DecoderLayer(nn.Module):
    """Masked cross-attention -> self-attention -> FFN (post-norm), the
    mmdet Mask2Former layer order."""
    dim: int = 256
    heads: int = 8
    ffn: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, qpos, mem, mpos, attn_mask):
        # attn_mask: (N, heads, Q, L) True = attend
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='cross_attn')(
                q + qpos, mem + mpos, mem, mask=attn_mask)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(q + a)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name='self_attn')(
                q + qpos, q + qpos, q)
        q = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(q + a)
        h = nn.Dense(self.ffn, dtype=self.dtype, name='ffn1')(q)
        h = nn.Dense(self.dim, dtype=self.dtype, name='ffn2')(nn.relu(h))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm3')(q + h)


class Mask2FormerVIS(nn.Module):
    """Backbone + pixel decoder + masked-attention transformer head.

    ``__call__(imgs (T, H, W, 3))`` treats the batch axis as TIME (the
    reference flattens (N, T) the same way) and returns per-layer
    (cls (Q, K+1), masks (Q, T, H/4, W/4)) lists."""
    cfg: Mask2FormerConfig = Mask2FormerConfig()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.backbone = ResNet(out_indices=(0, 1, 2, 3),
                               stage_blocks=c.stage_blocks,
                               base_width=c.base_width, dtype=self.dtype)
        if c.pixel_decoder == 'msdeform':
            self.pixel_decoder = MSDeformAttnPixelDecoder(
                c.embed_dim, num_layers=c.pixel_decoder_layers,
                dtype=self.dtype)
        else:
            self.pixel_decoder = PixelDecoderFPN(c.embed_dim,
                                                 dtype=self.dtype)
        # reference builds Conv2d projs only when decoder embed dims
        # differ from feat_channels (mask2former_head.py:122-131);
        # canonical configs hit the Identity branch
        if c.enforce_decoder_input_project:
            self.decoder_input_projs = [
                nn.Conv(c.embed_dim, (1, 1), dtype=self.dtype,
                        name=f'input_proj{i}')
                for i in range(c.num_feat_levels)]
        else:
            self.decoder_input_projs = [
                (lambda x: x) for _ in range(c.num_feat_levels)]
        self.level_embed = self.param(
            'level_embed', nn.initializers.normal(1.0),
            (c.num_feat_levels, c.embed_dim))
        self.query_feat = self.param(
            'query_feat', nn.initializers.normal(1.0),
            (c.num_queries, c.embed_dim))
        self.query_embed = self.param(
            'query_embed', nn.initializers.normal(1.0),
            (c.num_queries, c.embed_dim))
        self.layers = [
            _DecoderLayer(c.embed_dim, c.num_heads, c.ffn_dim,
                          dtype=self.dtype, name=f'layer{i}')
            for i in range(c.num_decoder_layers)]
        self.post_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='post_norm')
        self.cls_embed = nn.Dense(c.num_classes + 1, dtype=self.dtype,
                                  name='cls_embed')
        self.mask_embed_fc1 = nn.Dense(c.embed_dim, dtype=self.dtype)
        self.mask_embed_fc2 = nn.Dense(c.embed_dim, dtype=self.dtype)
        self.mask_embed_fc3 = nn.Dense(c.embed_dim, dtype=self.dtype)

    def _head(self, query, mask_features, target_hw):
        """mask2former_head.py:425-475. query (Q, C), mask_features
        (T, Hm, Wm, C). Returns (cls, mask_pred (Q, T, Hm, Wm),
        attn_mask (heads, Q, T*h*w))."""
        c = self.cfg
        out = self.post_norm(query)
        cls_pred = self.cls_embed(out)
        me = self.mask_embed_fc3(nn.relu(self.mask_embed_fc2(
            nn.relu(self.mask_embed_fc1(out)))))
        mask_pred = jnp.einsum('qc,thwc->qthw', me, mask_features)
        q, t = mask_pred.shape[0], mask_pred.shape[1]
        # F.interpolate(bilinear, align_corners=False) semantics — torch
        # does NOT antialias this downsample (_forward_head:458-463)
        am = jax.image.resize(
            mask_pred, (q, t, *target_hw), 'bilinear', antialias=False)
        am = jax.nn.sigmoid(am.reshape(q, -1)) >= 0.5   # True = attend
        # all-background query -> attend everywhere (:545-547)
        none = ~am.any(axis=1, keepdims=True)
        am = am | none
        am = jnp.broadcast_to(am[None], (c.num_heads, *am.shape))
        return cls_pred, mask_pred, jax.lax.stop_gradient(am)

    def __call__(self, imgs):
        c = self.cfg
        feats = self.backbone(imgs)
        mask_features, memories = self.pixel_decoder(feats)
        t = imgs.shape[0]

        mem_seqs, mem_pos = [], []
        for i, m in enumerate(memories):
            x = self.decoder_input_projs[i](m) + self.level_embed[i]
            th, tw = m.shape[1], m.shape[2]
            # SinePositionalEncoding3D over (T, h, w): the decoder keys
            # carry a temporal sine term (mask2former_head.py:78-80,520-526)
            pos = sine_positional_encoding_3d(t, th, tw, c.embed_dim // 2)
            mem_seqs.append(x.reshape(1, -1, c.embed_dim))   # (1, T*h*w, C)
            mem_pos.append(pos.reshape(1, -1, c.embed_dim))

        query = self.query_feat[None]          # (1, Q, C)
        qpos = self.query_embed[None]

        cls_list, mask_list = [], []
        cls_pred, mask_pred, attn_mask = self._head(
            query[0], mask_features,
            (memories[0].shape[1], memories[0].shape[2]))
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)

        for i, layer in enumerate(self.layers):
            lvl = i % c.num_feat_levels
            query = layer(query, qpos, mem_seqs[lvl], mem_pos[lvl],
                          attn_mask[None])
            nxt = (i + 1) % c.num_feat_levels
            cls_pred, mask_pred, attn_mask = self._head(
                query[0], mask_features,
                (memories[nxt].shape[1], memories[nxt].shape[2]))
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)
        return cls_list, mask_list


def mask2former_predict(cls_pred: jnp.ndarray, mask_pred: jnp.ndarray,
                        cfg: Mask2FormerConfig):
    """Video-level prediction (mask2former_head.py:646-710): take the
    top ``max_per_video`` (query, class) pairs; the query index IS the
    instance id across the whole video."""
    k = cfg.num_classes
    scores = jax.nn.softmax(cls_pred, axis=-1)[:, :k]     # (Q, K)
    flat = scores.reshape(-1)
    top_s, top_i = jax.lax.top_k(flat,
                                 min(cfg.max_per_video, flat.shape[0]))
    q_idx = top_i // k
    labels = top_i % k
    masks = jax.nn.sigmoid(mask_pred[q_idx]) > 0.5        # (P, T, H, W)
    return dict(scores=top_s, labels=labels, masks=masks,
                instances_id=q_idx)


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """mmcv ``point_sample`` (grid_sample, align_corners=False, zeros
    padding): masks (..., H, W), coords (P, 2) normalized (x, y) ->
    (..., P)."""
    hh, ww = masks.shape[-2], masks.shape[-1]
    x = coords[:, 0] * ww - 0.5
    y = coords[:, 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    flat = masks.reshape(-1, hh, ww)
    acc = 0.0
    for dy, dx, w in ((0, 0, (1 - fy) * (1 - fx)), (0, 1, (1 - fy) * fx),
                      (1, 0, fy * (1 - fx)), (1, 1, fy * fx)):
        gx = x0 + dx
        gy = y0 + dy
        inb = (gx >= 0) & (gx < ww) & (gy >= 0) & (gy < hh)
        gxc = jnp.clip(gx, 0, ww - 1).astype(jnp.int32)
        gyc = jnp.clip(gy, 0, hh - 1).astype(jnp.int32)
        acc = acc + jnp.where(inb, w, 0.0)[None] * flat[:, gyc, gxc]
    return acc.reshape(*masks.shape[:-2], coords.shape[0])


def uncertain_point_coords(logits: jnp.ndarray, key, num_points: int,
                           oversample_ratio: float = 3.0,
                           importance_sample_ratio: float = 0.75
                           ) -> jnp.ndarray:
    """mmdet ``get_uncertain_point_coords_with_randomness``: per mask,
    sample ``oversample * P`` uniform points, keep the
    ``importance_ratio * P`` most uncertain (uncertainty = -|logit|), and
    top up with fresh uniform points.  logits (M, H, W) -> (M, P, 2)."""
    m = logits.shape[0]
    n_samp = int(num_points * oversample_ratio)
    n_unc = int(num_points * importance_sample_ratio)
    n_rand = num_points - n_unc
    k1, k2 = jax.random.split(key)
    cand = jax.random.uniform(k1, (m, n_samp, 2))
    vals = jax.vmap(point_sample)(logits, cand)          # (M, n_samp)
    _, idx = jax.lax.top_k(-jnp.abs(vals), n_unc)
    picked = jnp.take_along_axis(cand, idx[..., None], axis=1)
    rand = jax.random.uniform(k2, (m, n_rand, 2))
    return jnp.concatenate([picked, rand], axis=1)


def _dice_cost(pred: jnp.ndarray, gt: jnp.ndarray, eps=1.0) -> jnp.ndarray:
    """pred (Q, P) sigmoid probs flattened; gt (G, P) binary ->
    (Q, G) dice cost."""
    num = 2 * jnp.einsum('qp,gp->qg', pred, gt)
    den = pred.sum(-1)[:, None] + gt.sum(-1)[None, :]
    return 1 - (num + eps) / (den + eps)


def mask2former_loss(cls_list, mask_list, gt_labels: jnp.ndarray,
                     gt_masks: jnp.ndarray, gt_valid: jnp.ndarray,
                     cfg: Mask2FormerConfig, key=None,
                     cls_weight: float = 2.0, mask_weight: float = 5.0,
                     dice_weight: float = 5.0) -> dict:
    """Hungarian-matched per-layer loss (mask2former_head.py:250-424) with
    mmdet's point sampling: match costs on ``cfg.num_points`` uniform
    random points shared across queries/GTs (head:287-304), mask/dice
    losses on per-(query, frame) uncertainty-importance-sampled points
    (head:395-420 get_uncertain_point_coords_with_randomness).  CE
    classification uses background class weight 0.1.  ``gt_masks``
    (G, T, H, W) binary at mask-feature resolution."""
    if key is None:
        key = jax.random.PRNGKey(0)
    total = {}
    g = gt_labels.shape[0]
    eps = 1e-6
    for li, (cls_pred, mask_pred) in enumerate(zip(cls_list, mask_list)):
        key, k_match, k_unc = jax.random.split(key, 3)
        q, t = mask_pred.shape[0], mask_pred.shape[1]
        probs = jax.nn.softmax(cls_pred, -1)
        cost_cls = -probs[:, gt_labels] * cls_weight          # (Q, G)

        # ---- match costs on shared uniform points (head:287-304) ----
        pts = jax.random.uniform(k_match, (cfg.num_points, 2))
        mp_l = point_sample(mask_pred, pts).reshape(q, -1)    # logits
        gm_p = point_sample(gt_masks.astype(jnp.float32),
                            pts).reshape(g, -1)
        # CrossEntropyLossCost(use_sigmoid): per-point BCE-with-logits,
        # averaged over the sampled points
        pos = jax.nn.softplus(-mp_l)                         # BCE vs 1
        neg = jax.nn.softplus(mp_l)                          # BCE vs 0
        bce = (jnp.einsum('qp,gp->qg', pos, gm_p)
               + jnp.einsum('qp,gp->qg', neg, 1 - gm_p)) / mp_l.shape[1]
        mp_s = jax.nn.sigmoid(mp_l)
        cost = cost_cls + mask_weight * bce \
            + dice_weight * _dice_cost(mp_s, gm_p)
        cost = jnp.where(gt_valid[None, :], cost, 1e6)
        row, _ = linear_assignment_with_limit(
            cost, jnp.ones(q, bool), gt_valid, 1e6 / 2)
        matched = row >= 0
        tgt_idx = jnp.clip(row, 0, g - 1)

        tgt_cls = jnp.where(matched, gt_labels[tgt_idx], cfg.num_classes)
        logp = jax.nn.log_softmax(cls_pred, -1)
        picked = jnp.take_along_axis(logp, tgt_cls[:, None], 1)[:, 0]
        w = jnp.where(matched, 1.0, 0.1)      # background class weight
        loss_cls = -(picked * w).sum() / w.sum() * cls_weight

        # ---- mask losses on uncertainty-sampled points (head:395-420):
        # coords per (query, frame) from the prediction's own logits ----
        n_pos = jnp.maximum(matched.sum(), 1)
        flat_logits = mask_pred.reshape(q * t, *mask_pred.shape[2:])
        coords = uncertain_point_coords(
            jax.lax.stop_gradient(flat_logits), k_unc, cfg.num_points,
            cfg.oversample_ratio, cfg.importance_sample_ratio)
        pred_pts = jax.vmap(point_sample)(flat_logits, coords)
        tgt_masks = gt_masks[tgt_idx].reshape(q * t, *gt_masks.shape[2:])
        tgt_pts = jax.vmap(point_sample)(tgt_masks.astype(jnp.float32),
                                         coords)
        pred_pts = pred_pts.reshape(q, t, -1)
        tgt_pts = tgt_pts.reshape(q, t, -1)
        bce_pt = tgt_pts * jax.nn.softplus(-pred_pts) \
            + (1 - tgt_pts) * jax.nn.softplus(pred_pts)
        # avg_factor = num_total_masks * num_points (head:417-420)
        loss_mask = (bce_pt.sum(-1).sum(-1) * matched).sum() \
            / (n_pos * cfg.num_points) * mask_weight
        sp = jax.nn.sigmoid(pred_pts)
        num = 2 * (sp * tgt_pts).sum(-1)
        den = sp.sum(-1) + tgt_pts.sum(-1)
        dice = 1 - (num + 1.0) / (den + 1.0)                 # (Q, T)
        # avg_factor = num_total_masks, each frame an instance (head:412)
        loss_dice = (dice.sum(-1) * matched).sum() / n_pos * dice_weight

        suffix = '' if li == len(cls_list) - 1 else f'.d{li}'
        total[f'loss_cls{suffix}'] = loss_cls
        total[f'loss_mask{suffix}'] = loss_mask
        total[f'loss_dice{suffix}'] = loss_dice
    return total
