"""SiamRPN++ single-object tracker, TPU-native (JAX/Flax).

Re-creates the behavior of the reference SiamRPN stack:

* model orchestration  /root/reference/mmtrack/models/sot/siamrpn.py
  (crop-with-context -> backbone -> neck -> center-crop template;
  track = crop search region -> head -> penalty/window argmax -> smooth)
* head                 /root/reference/mmtrack/models/track_heads/
  siamese_rpn_head.py (multi-level CorrelationHead with weighted sum,
  anchor decode, scale/aspect penalties, hanning window, size smoothing)
* anchors              /root/reference/mmtrack/models/task_modules/anchor/
  sot_anchor_generator.py (truncating base-anchor arithmetic, spatial-major
  anchor-minor flatten order, per-anchor tiled hanning window)

TPU-first design: the whole per-frame step — sub-pixel crop+resize (a
separable bilinear gather, replacing the reference's integer crop +
F.interpolate), ResNet forward, correlation head and the penalty argmax —
is ONE jitted program over fixed shapes; tracker state is a pytree
(bbox cxcywh, template features, channel means) threaded functionally.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .resnet import SOTResNet


class SiamRPNTestCfg(NamedTuple):
    exemplar_size: int = 127
    search_size: int = 255
    context_amount: float = 0.5
    center_size: int = 7
    penalty_k: float = 0.05
    window_influence: float = 0.42
    lr: float = 0.38


def _sot_backbone_size(x: int) -> int:
    """Spatial size of SOTResNet output for input size ``x`` (7x7/2 pad-0
    stem, 3x3/2 pad-1 pool, 3x3/2 pad-0 stage-2 conv; stages 3/4 keep
    the resolution)."""
    c1 = (x - 7) // 2 + 1
    pool = (c1 - 1) // 2 + 1
    return (pool - 3) // 2 + 1


# ---------------------------------------------------------------------------
# anchors (SiameseRPNAnchorGenerator semantics)
# ---------------------------------------------------------------------------

def siamese_rpn_anchors(feat_size: int, stride: int = 8,
                        ratios: Sequence[float] = (0.33, 0.5, 1., 2., 3.),
                        scales: Sequence[int] = (8,)) -> np.ndarray:
    """Grid anchors in xyxy, origin at the search-region center, flattened
    spatial-major / anchor-minor — (H*W*K, 4).

    Matches sot_anchor_generator.py:51-98 including the ``.long()``
    truncation of ``base * ratio`` before the scale multiply, and the
    center shift of siamese_rpn_head.py:565-573.
    """
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray(scales, np.float64)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (np.floor(stride * w_ratios)[:, None] * scales[None, :]).reshape(-1)
    hs = (np.floor(stride * h_ratios)[:, None] * scales[None, :]).reshape(-1)
    base = np.stack([-0.5 * ws, -0.5 * hs, 0.5 * ws, 0.5 * hs], -1)  # (K, 4)

    xs = np.arange(feat_size) * stride
    shift = np.stack(np.meshgrid(xs, xs, indexing='xy'), -1)  # (H, W, [x,y])
    shift = shift.reshape(-1, 2)[:, [0, 1, 0, 1]]
    anchors = base[None] + shift[:, None, :]                  # (HW, K, 4)
    anchors = anchors.reshape(-1, 4)
    anchors[:, 0::2] -= (feat_size // 2) * stride
    anchors[:, 1::2] -= (feat_size // 2) * stride
    return anchors.astype(np.float32)


def hanning_window(feat_size: int, num_anchors: int) -> np.ndarray:
    """Per-anchor tiled 2D hanning window, same flatten order as anchors
    (sot_anchor_generator.py:27-49: ``window.flatten().repeat(K)``)."""
    w = np.outer(np.hanning(feat_size), np.hanning(feat_size))
    return np.repeat(w.reshape(-1), num_anchors).astype(np.float32)


def delta_decode(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 wh_ratio_clip: float = 16 / 1000) -> jnp.ndarray:
    """mmdet DeltaXYWHBBoxCoder.decode with unit stds, returning xyxy."""
    pw = anchors[:, 2] - anchors[:, 0]
    ph = anchors[:, 3] - anchors[:, 1]
    px = (anchors[:, 0] + anchors[:, 2]) * 0.5
    py = (anchors[:, 1] + anchors[:, 3]) * 0.5
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dx, dy = deltas[:, 0], deltas[:, 1]
    dw = jnp.clip(deltas[:, 2], -max_ratio, max_ratio)
    dh = jnp.clip(deltas[:, 3], -max_ratio, max_ratio)
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    return jnp.stack([gx - gw / 2, gy - gh / 2,
                      gx + gw / 2, gy + gh / 2], -1)


def delta_encode(anchors: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    pw = anchors[:, 2] - anchors[:, 0]
    ph = anchors[:, 3] - anchors[:, 1]
    px = (anchors[:, 0] + anchors[:, 2]) * 0.5
    py = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gw = gt[2] - gt[0]
    gh = gt[3] - gt[1]
    gx = (gt[0] + gt[2]) * 0.5
    gy = (gt[1] + gt[3]) * 0.5
    return jnp.stack([(gx - px) / pw, (gy - py) / ph,
                      jnp.log(gw / pw), jnp.log(gh / ph)], -1)


# ---------------------------------------------------------------------------
# device-side crop + resize (siamrpn.py:102-168 semantics)
# ---------------------------------------------------------------------------

def crop_resize(img: jnp.ndarray, center_xy: jnp.ndarray,
                crop_size: jnp.ndarray, out_size: int,
                pad_value: jnp.ndarray) -> jnp.ndarray:
    """Crop ``img`` (H, W, C) around ``center_xy`` with side ``crop_size``
    and bilinear-resize to (out_size, out_size, C).

    Mirrors SiamRPN.get_cropped_img: integer context bounds via
    truncation (:129-132), constant ``pad_value`` outside the image, then
    align_corners=False bilinear resampling — but as a single separable
    gather, fully jittable with a dynamic center/size and a static output
    size (no host round-trip, no dynamic shapes).
    """
    h, w, _ = img.shape
    cmin = jnp.trunc(center_xy - crop_size / 2.0)
    cmax = jnp.trunc(center_xy + crop_size / 2.0)
    span = cmax - cmin + 1.0                      # crop extent in pixels

    def axis_coords(lo, extent, size):
        scale = extent / out_size
        pos = lo + (jnp.arange(out_size) + 0.5) * scale - 0.5
        return jnp.clip(pos, lo, lo + extent - 1.0)

    def gather_1d(arr, pos, axis_len, axis):
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = (pos - i0)[(...,) + (None,) * (arr.ndim - 1)]
        i1 = i0 + 1

        def fetch(idx):
            valid = (idx >= 0) & (idx < axis_len)
            v = jnp.take(arr, jnp.clip(idx, 0, axis_len - 1), axis=axis)
            mask = valid[(...,) + (None,) * (arr.ndim - 1)]
            return jnp.where(mask, v, pad_value)

        return fetch(i0) * (1 - frac) + fetch(i1) * frac

    ys = axis_coords(cmin[1], span[1], out_size)
    xs = axis_coords(cmin[0], span[0], out_size)
    rows = gather_1d(img, ys, h, 0)               # (out, W, C)
    cols = gather_1d(rows.transpose(1, 0, 2), xs, w, 0)  # (out, out, C)
    return cols.transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

class _ConvBNReLU(nn.Module):
    features: int
    kernel: int
    relu: bool = True
    norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # mmcv ConvModule with default padding=0 (VALID) as used by
        # CorrelationHead (siamese_rpn_head.py:49-74)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding='VALID', use_bias=not self.norm,
                    dtype=self.dtype, name='conv')(x)
        if self.norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x) if self.relu else x


def depthwise_correlation(search: jnp.ndarray,
                          kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-channel valid cross-correlation of one search map (Hs, Ws, C)
    with one kernel (Hk, Wk, C) — task_modules/track/correlation.py
    semantics, expressed as a C-group conv that XLA maps onto the MXU."""
    c = search.shape[-1]
    w = kernel[:, :, None, :]                  # (Hk, Wk, I=1, O=C)
    out = jax.lax.conv_general_dilated(
        search[None], w, (1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=c)
    return out[0]


class ChannelMapperNeck(nn.Module):
    """1x1 conv + BN per level (mmdet ChannelMapper, act_cfg=None), the
    SiamRPN++ neck."""
    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...], train: bool = False):
        outs = []
        for i, f in enumerate(feats):
            f = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f'conv{i}')(f)
            f = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f'bn{i}')(f)
            outs.append(f)
        return tuple(outs)


class CorrelationHead(nn.Module):
    """kernel/search 3x3 convs -> depthwise xcorr -> two 1x1 convs
    (siamese_rpn_head.py:19-90)."""
    mid_channels: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, kernel, search, train: bool = False):
        k = _ConvBNReLU(self.mid_channels, 3, dtype=self.dtype,
                        name='kernel_convs')(kernel, train)
        s = _ConvBNReLU(self.mid_channels, 3, dtype=self.dtype,
                        name='search_convs')(search, train)
        corr = jax.vmap(depthwise_correlation)(s, k)
        out = _ConvBNReLU(self.mid_channels, 1, dtype=self.dtype,
                          name='head_conv1')(corr, train)
        return _ConvBNReLU(self.out_channels, 1, relu=False, norm=False,
                           dtype=self.dtype, name='head_conv2')(out, train)


class SiameseRPNHead(nn.Module):
    """Multi-level correlation heads with softmax-weighted sums
    (siamese_rpn_head.py:163-227). Returns (cls_score, bbox_pred) of
    shapes (N, H, W, 2K) / (N, H, W, 4K) in NHWC."""
    in_channels: Tuple[int, ...] = (256, 256, 256)
    num_anchors: int = 5
    weighted_sum: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z_feats, x_feats, train: bool = False):
        n_lvl = len(self.in_channels)
        if self.weighted_sum:
            cls_w = nn.softmax(self.param(
                'cls_weight', nn.initializers.ones, (n_lvl,)))
            reg_w = nn.softmax(self.param(
                'reg_weight', nn.initializers.ones, (n_lvl,)))
        else:
            cls_w = reg_w = jnp.full((n_lvl,), 1.0 / n_lvl)

        cls_score, bbox_pred = 0., 0.
        for i in range(n_lvl):
            c = CorrelationHead(self.in_channels[i], 2 * self.num_anchors,
                                dtype=self.dtype, name=f'cls_head{i}')(
                                    z_feats[i], x_feats[i], train)
            r = CorrelationHead(self.in_channels[i], 4 * self.num_anchors,
                                dtype=self.dtype, name=f'reg_head{i}')(
                                    z_feats[i], x_feats[i], train)
            cls_score = cls_score + cls_w[i] * c
            bbox_pred = bbox_pred + reg_w[i] * r
        return cls_score, bbox_pred


class SiamRPNModule(nn.Module):
    """Backbone + neck + head as one Flax module. ``mode`` selects the
    sub-computation so a single parameter tree serves template/search/head
    passes (siamrpn.py:65-100 forward_template/forward_search)."""
    center_size: int = 7
    # tiny-config backbone knobs (default = canonical SOT r50)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = SOTResNet(stage_blocks=self.stage_blocks,
                                  base_width=self.base_width,
                                  dtype=self.dtype)
        self.neck = ChannelMapperNeck(dtype=self.dtype)
        self.head = SiameseRPNHead(dtype=self.dtype)

    def template(self, z_img, train: bool = False):
        feats = self.neck(self.backbone(z_img, train), train)
        out = []
        for f in feats:
            left = (f.shape[2] - self.center_size) // 2
            out.append(f[:, left:left + self.center_size,
                         left:left + self.center_size, :])
        return tuple(out)

    def search(self, x_img, train: bool = False):
        return self.neck(self.backbone(x_img, train), train)

    def rpn(self, z_feats, x_feats, train: bool = False):
        return self.head(z_feats, x_feats, train)

    def __call__(self, z_img, x_img, train: bool = False):
        return self.rpn(self.template(z_img, train),
                        self.search(x_img, train), train)


# ---------------------------------------------------------------------------
# functional tracker
# ---------------------------------------------------------------------------

class SiamRPNState(NamedTuple):
    bbox: jnp.ndarray          # (4,) cxcywh in original image coords
    z_feats: Tuple[jnp.ndarray, ...]
    avg_channel: jnp.ndarray   # (C,)


class SiamRPNTracker:
    """Jitted init/track pair over fixed image shape.

    Usage::

        trk = SiamRPNTracker(variables, test_cfg)
        state = trk.init(img, bbox_xyxy)       # first frame
        state, (bbox_xyxy, score) = trk.track(img, state)
    """

    def __init__(self, variables, cfg: SiamRPNTestCfg = SiamRPNTestCfg(),
                 dtype=jnp.float32, module: 'SiamRPNModule' = None):
        self.cfg = cfg
        self.module = module or SiamRPNModule(center_size=cfg.center_size,
                                              dtype=dtype)
        self.variables = variables
        # head output size: backbone(search) -> VALID 3x3 conv; template
        # center crop -> VALID 3x3 conv; VALID xcorr. For the canonical
        # 127/255 crops: backbone 31 -> 29, kernel 7 -> 5, xcorr -> 25.
        self._feat = _sot_backbone_size(cfg.search_size) \
            - cfg.center_size + 1
        self.anchors = jnp.asarray(siamese_rpn_anchors(self._feat))
        self.window = jnp.asarray(hanning_window(self._feat, 5))
        self._init = jax.jit(self._init_impl)
        self._track = jax.jit(self._track_impl)

    def init(self, img, bbox_xyxy):
        img = jnp.asarray(img, jnp.float32)
        bbox = jnp.asarray(bbox_xyxy, jnp.float32)
        cxcywh = jnp.stack([(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2,
                            bbox[2] - bbox[0], bbox[3] - bbox[1]])
        return self._init(img, cxcywh)

    def track(self, img, state: SiamRPNState):
        return self._track(jnp.asarray(img, jnp.float32), state)

    # -- impl --------------------------------------------------------------
    def _z_size(self, bbox):
        amt = self.cfg.context_amount
        zw = bbox[2] + amt * (bbox[2] + bbox[3])
        zh = bbox[3] + amt * (bbox[2] + bbox[3])
        return jnp.sqrt(zw * zh)

    def _init_impl(self, img, bbox):
        avg = img.mean(axis=(0, 1))
        z_size = jnp.round(self._z_size(bbox))
        z_crop = crop_resize(img, bbox[:2], z_size,
                             self.cfg.exemplar_size, avg)
        z_feats = self.module.apply(self.variables, z_crop[None],
                                    method=SiamRPNModule.template)
        return SiamRPNState(bbox, z_feats, avg)

    def _track_impl(self, img, state: SiamRPNState):
        cfg = self.cfg
        bbox = state.bbox
        z_size = self._z_size(bbox)
        x_size = jnp.round(z_size * (cfg.search_size / cfg.exemplar_size))
        x_crop = crop_resize(img, bbox[:2], x_size, cfg.search_size,
                             state.avg_channel)
        x_feats = self.module.apply(self.variables, x_crop[None],
                                    method=SiamRPNModule.search)
        cls_score, bbox_pred = self.module.apply(
            self.variables, state.z_feats, x_feats,
            method=SiamRPNModule.rpn)
        new_bbox, best_score = siamrpn_postprocess(
            cls_score, bbox_pred, bbox, z_size, self.anchors,
            self.window, cfg, (img.shape[0], img.shape[1]))
        out_xyxy = jnp.stack([
            new_bbox[0] - new_bbox[2] / 2, new_bbox[1] - new_bbox[3] / 2,
            new_bbox[0] + new_bbox[2] / 2, new_bbox[1] + new_bbox[3] / 2])
        return state._replace(bbox=new_bbox), (out_xyxy, best_score)


def siamrpn_postprocess(cls_score, bbox_pred, bbox, z_size, anchors,
                        window, cfg: SiamRPNTestCfg, img_hw):
    """Penalty/window argmax + size smoothing (siamese_rpn_head.py
    get_bbox semantics). ``bbox`` is the previous cxcywh state;
    returns (new cxcywh bbox, best raw score)."""
    h_img, w_img = img_hw
    scale_factor = cfg.exemplar_size / z_size

    # flatten spatial-major anchor-minor; NHWC channels are
    # (anchor-major, 2/4-minor)? The torch layout is (2, K, H, W) ->
    # permute(H, W, K, 2): channel c = a*2 + j after our NHWC conv
    # emits (..., 2K) with the SAME (j-major? ) — we define our conv
    # output channel as j*K + a to match the reference's
    # view(2, -1, H, W) split, see _split_channels.
    n, h, w, _ = cls_score.shape
    cls = cls_score.reshape(h * w, 2, 5).transpose(0, 2, 1).reshape(-1, 2)
    score = jax.nn.softmax(cls, axis=-1)[:, 1]
    reg = bbox_pred.reshape(h * w, 4, 5).transpose(0, 2, 1).reshape(-1, 4)
    boxes = delta_decode(anchors, reg)         # xyxy, center origin

    bw = boxes[:, 2] - boxes[:, 0]
    bh = boxes[:, 3] - boxes[:, 1]
    bx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    by = (boxes[:, 1] + boxes[:, 3]) * 0.5

    def change(r):
        return jnp.maximum(r, 1.0 / r)

    def enlarge(wd, ht):
        pad = (wd + ht) * 0.5
        return jnp.sqrt((wd + pad) * (ht + pad))

    s_pen = change(enlarge(bw, bh) /
                   enlarge(bbox[2] * scale_factor,
                           bbox[3] * scale_factor))
    r_pen = change((bbox[2] / bbox[3]) / (bw / bh))
    penalty = jnp.exp(-(r_pen * s_pen - 1) * cfg.penalty_k)
    pscore = penalty * score
    pscore = pscore * (1 - cfg.window_influence) \
        + window * cfg.window_influence

    best = jnp.argmax(pscore)
    best_score = score[best]
    lr = penalty[best] * best_score * cfg.lr
    cx = bx[best] / scale_factor + bbox[0]
    cy = by[best] / scale_factor + bbox[1]
    nw = bbox[2] * (1 - lr) + (bw[best] / scale_factor) * lr
    nh = bbox[3] * (1 - lr) + (bh[best] / scale_factor) * lr

    new_bbox = jnp.stack([
        jnp.clip(cx, 0., w_img), jnp.clip(cy, 0., h_img),
        jnp.clip(nw, 10., w_img), jnp.clip(nh, 10., h_img)])
    return new_bbox, best_score
