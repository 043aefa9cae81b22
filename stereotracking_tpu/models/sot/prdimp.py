"""PrDiMP probabilistic-regression tracker, TPU-native (JAX/Flax).

Re-creates the reference PrDiMP stack:

* model      /root/reference/mmtrack/models/sot/prdimp.py (sample crop
  with replicate border + 'inside' shift, augmented first-frame init,
  classifier locate -> IoUNet refine -> classifier update loop)
* cls head   /root/reference/mmtrack/models/track_heads/prdimp_cls_head.py
  (512-d channel mapping with energy normalization, discriminative
  filter, 50-slot sample memory with the reference's weight-update
  recurrence, 4-state localization: normal / hard_negative / uncertain /
  not_found)
* optimizer  /root/reference/mmtrack/models/filter/filter_optimizer.py
  (steepest descent with Newton step length on the probabilistic KL
  objective — exact transcription, including the Hessian-vector step)
* initializer /root/reference/mmtrack/models/filter/filter_head.py
  (zero-init conv + target-roi pooling, averaged over init samples)
* IoUNet     /root/reference/mmtrack/models/track_heads/iounet_head.py
  (modulation vectors from the template roi, IoU prediction over pooled
  proposal features, gradient ASCENT on relative box coords — done here
  with jax.grad instead of torch autograd handles)

PrRoIPool is evaluated EXACTLY via the closed-form separable
hat-integral pooling in ``ops/prroi_pool.py`` (the analytic integral of
the bilinear surface — same semantics as the reference CUDA kernel,
differentiable in the roi coordinates for the IoUNet refinement).
The first-frame augmentation set is complete: identity, relative shifts,
horizontal flip, Gaussian blurs, rotations (mmcv.imrotate semantics,
``_imrotate``) and feature dropout (prdimp.py:143-219).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.prroi_pool import prroi_pool
from ..resnet import ResNet

# localization states (prdimp_cls_head.py:409-474)
NORMAL, HARD_NEGATIVE, UNCERTAIN, NOT_FOUND = 0, 1, 2, 3


class PrDiMPTestCfg(NamedTuple):
    img_sample_size: int = 352            # 22 * 16
    search_scale_factor: float = 6.0
    feat_stride: int = 16
    filter_size: int = 4
    # init augmentation (prdimp.py:143-219)
    aug_expansion_factor: float = 2.0
    random_shift_factor: float = 1 / 3
    relative_shifts: Tuple[Tuple[float, float], ...] = (
        (0.6, 0.6), (-0.6, 0.6), (0.6, -0.6), (-0.6, -0.6))
    blur_sigmas: Tuple[Tuple[float, float], ...] = ((2, 0.2), (0.2, 2),
                                                    (3, 1), (1, 3), (2, 2))
    rotate_angles: Tuple[float, ...] = (10., -10., 45., -45.)
    dropout_probs: Tuple[float, ...] = (0.2, 0.2)
    # locate_cfg
    no_target_min_score: float = 0.04
    distractor_thres: float = 0.8
    hard_neg_thres: float = 0.5
    target_neighborhood_scale: float = 2.2
    displacement_scale: float = 0.8
    bbox_inside_ratio: float = 0.2
    # update_cfg
    sample_memory_size: int = 50
    normal_lr: float = 0.01
    hard_neg_lr: float = 0.02
    init_samples_min_weight: float = 0.25
    train_skipping: int = 20
    # optimizer_cfg
    init_update_iters: int = 10
    update_iters: int = 2
    hard_neg_iters: int = 1
    gauss_sigma: float = 0.9
    init_step_length: float = 1.0
    init_filter_regular: float = 0.05
    min_filter_regular: float = 0.05
    # bbox_cfg (iounet_head.py)
    num_init_random_boxes: int = 9
    box_jitter_pos: float = 0.1
    box_jitter_sz: float = 0.5
    iounet_topk: int = 3
    box_refine_step_length: Tuple[float, float] = (2.5e-3, 5e-3)
    box_refine_iter: int = 10
    box_refine_step_decay: float = 1.0
    max_aspect_ratio: float = 5.0


# ---------------------------------------------------------------------------
# crop with replicate border + 'inside' shift (prdimp.py:313-390)
# ---------------------------------------------------------------------------

def prdimp_crop(img: jnp.ndarray, bbox_cxcywh: jnp.ndarray,
                scale_factor: float, out_size: int,
                inside: bool = True,
                max_scale_change: float = 1.5
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop ``sqrt(w*h)*scale`` square, replicate-padded, optionally
    shifted/shrunk inside the image, resized (align_corners=True) to
    ``out_size``. Returns (patch (S, S, C), patch_coord cxcywh (4,))."""
    h, w, _ = img.shape
    crop_size = jnp.sqrt(bbox_cxcywh[2] * bbox_cxcywh[3]) * scale_factor
    if inside:
        shrink = jnp.maximum(crop_size / w, crop_size / h)
        shrink = jnp.clip(shrink, 1.0, max_scale_change)
        crop_size = jnp.floor(crop_size / shrink)
    tl = jnp.floor(bbox_cxcywh[:2] - jnp.floor(crop_size / 2))
    br = jnp.floor(bbox_cxcywh[:2] + jnp.floor(crop_size / 2))
    if inside:
        img_sz = jnp.asarray([w, h], jnp.float32)
        shift = jnp.clip(-tl, 0, None) - jnp.clip(br - img_sz, 0, None)
        tl = tl + shift
        br = br + shift
        outside = jnp.floor(
            (jnp.clip(-tl, 0, None) + jnp.clip(br - img_sz, 0, None)) / 2)
        shift = (-tl - outside) * (outside > 0)
        tl = tl + shift
        br = br + shift
    coord = jnp.concatenate([(tl + br) / 2, br - tl])

    span = br - tl

    def axis(lo, extent):
        # align_corners=True resize of the [lo, lo+extent) crop
        pos = lo + jnp.arange(out_size) * (extent - 1) \
            / max(out_size - 1, 1)
        return pos

    def gather(arr, pos, size, ax):
        p = jnp.clip(pos, 0, size - 1)          # replicate border
        i0 = jnp.floor(p).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, size - 1)
        f = (p - i0)[(...,) + (None,) * (arr.ndim - 1)]
        v0 = jnp.take(arr, i0, axis=ax)
        v1 = jnp.take(arr, i1, axis=ax)
        return v0 * (1 - f) + v1 * f

    rows = gather(img, axis(tl[1], span[1]), h, 0)
    patch = gather(rows.transpose(1, 0, 2), axis(tl[0], span[0]), w, 0)
    return patch.transpose(1, 0, 2), coord


# ---------------------------------------------------------------------------
# filter ops (task_modules/filter/filter.py)
# ---------------------------------------------------------------------------

def apply_filter(feat: jnp.ndarray, filt: jnp.ndarray) -> jnp.ndarray:
    """feat (N, H, W, C) x filter (fh, fw, C) -> scores (N, H', W')
    (SAME-centered correlation, filter.py:7-33)."""
    fh, fw = filt.shape[0], filt.shape[1]
    out = jax.lax.conv_general_dilated(
        feat, filt[..., None], (1, 1),
        padding=[(fh // 2, fh // 2), (fw // 2, fw // 2)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out[..., 0]


def apply_feat_transpose(feat: jnp.ndarray, activation: jnp.ndarray,
                         filter_hw: Tuple[int, int]) -> jnp.ndarray:
    """Gradient of ``apply_filter`` w.r.t. the filter: correlate features
    with the activation map (filter.py:36-100). feat (N, H, W, C),
    activation (N, Ho, Wo) -> (fh, fw, C)."""
    grad = jax.grad(
        lambda f: (apply_filter(feat, f) * activation).sum())(
            jnp.zeros((*filter_hw, feat.shape[-1]), feat.dtype))
    return grad


def gen_label_density(centers_yx: jnp.ndarray, out_hw: Tuple[int, int],
                      sigma: float) -> jnp.ndarray:
    """Normalized Gaussian label densities (filter_optimizer.py:60-103).
    centers_yx (N, 2) -> (N, H, W)."""
    k0 = jnp.arange(out_hw[0], dtype=jnp.float32)[None, :, None]
    k1 = jnp.arange(out_hw[1], dtype=jnp.float32)[None, None, :]
    d0 = (k0 - centers_yx[:, 0][:, None, None]) ** 2
    d1 = (k1 - centers_yx[:, 1][:, None, None]) ** 2
    g = jnp.exp(-(d0 + d1) / (2 * sigma ** 2)) / (2 * math.pi * sigma ** 2)
    return g / (g.sum(axis=(-2, -1), keepdims=True) + 1e-8)


def optimize_filter(filt: jnp.ndarray, feat: jnp.ndarray,
                    bboxes_cxcywh: jnp.ndarray,
                    sample_weights: jnp.ndarray, num_iters: int,
                    cfg: PrDiMPTestCfg,
                    log_step_length: jnp.ndarray,
                    filter_regular_param: jnp.ndarray) -> jnp.ndarray:
    """Steepest descent with Newton step length on the PrDiMP objective
    (filter_optimizer.py:105-255, exact math). feat (N, H, W, C),
    sample_weights (N,)."""
    fh, fw = filt.shape[0], filt.shape[1]
    out_hw = (feat.shape[1] + (fh + 1) % 2, feat.shape[2] + (fw + 1) % 2)
    step_factor = jnp.exp(log_step_length)
    regular = jnp.maximum(filter_regular_param ** 2,
                          cfg.min_filter_regular ** 2)

    offset = jnp.asarray([fh % 2, fw % 2], jnp.float32) / 2.0
    centers = bboxes_cxcywh[:, :2] / cfg.feat_stride
    centers_yx = centers[:, ::-1] - offset
    density = gen_label_density(centers_yx, out_hw, cfg.gauss_sigma)
    sw = sample_weights[:, None, None]

    def body(_, f):
        raw = apply_filter(feat, f)
        n = raw.shape[0]
        scores = jax.nn.softmax(raw.reshape(n, -1), -1).reshape(raw.shape)
        res = sw * (scores - density)
        grad = apply_feat_transpose(feat, res, (fh, fw)) + regular * f
        # Newton step length via the Hessian-vector product
        sg = apply_filter(feat, grad)
        sm_sg = scores * sg
        hes_sg = sm_sg - scores * sm_sg.sum(axis=(-2, -1), keepdims=True)
        ghg = jnp.clip((sg * hes_sg).reshape(n, -1).sum(-1), 0, None)
        ghg = (sample_weights * ghg).sum()
        a_num = (grad * grad).sum()
        alpha = a_num / jnp.maximum(ghg + regular * a_num, 1e-8)
        return f - step_factor * alpha * grad

    return jax.lax.fori_loop(0, num_iters, body, filt)


# ---------------------------------------------------------------------------
# Flax modules
# ---------------------------------------------------------------------------

class PrDiMPClsModule(nn.Module):
    """Channel mapping + filter initializer params + optimizer scalars."""
    in_dim: int = 1024
    out_dim: int = 512
    filter_size: int = 4
    cfg: PrDiMPTestCfg = PrDiMPTestCfg()
    dtype: Any = jnp.float32

    def setup(self):
        self.channel_mapping = nn.Conv(self.out_dim, (3, 3), padding=1,
                                       use_bias=False, dtype=self.dtype,
                                       name='channel_mapping')
        self.filter_conv = nn.Conv(self.out_dim, (3, 3), padding=1,
                                   kernel_init=nn.initializers.zeros,
                                   bias_init=nn.initializers.zeros,
                                   dtype=self.dtype, name='filter_conv')
        self.log_step_length = self.param(
            'log_step_length',
            lambda k, s: jnp.full(s, math.log(self.cfg.init_step_length)),
            (1,))
        self.filter_regular = self.param(
            'filter_regular',
            lambda k, s: jnp.full(s, self.cfg.init_filter_regular), (1,))

    def cls_feats(self, backbone_feat):
        """Energy-normalized classification features
        (prdimp_cls_head.py:90-107)."""
        f = self.channel_mapping(backbone_feat)
        norm_scale = math.sqrt(1.0 / (self.out_dim * self.filter_size ** 2))
        n = f.shape[0]
        energy = (f ** 2).reshape(n, 1, 1, -1).sum(axis=3, keepdims=True)
        numel = float(np.prod(f.shape[1:]))
        scale = jnp.sqrt(numel / (energy + 1e-5))
        return f * norm_scale * scale

    def init_filter(self, cls_feats, bboxes_xyxy):
        """filter_head.py:41-76: conv + target-roi pool, averaged."""
        f = self.filter_conv(cls_feats)
        pooled = jax.vmap(
            lambda ft, bb: prroi_pool(ft, bb[None], self.filter_size,
                                      1.0 / self.cfg.feat_stride)[0])(
            f, bboxes_xyxy)
        return pooled.mean(axis=0)            # (fs, fs, C)

    def __call__(self, backbone_feat, bboxes_xyxy):
        feats = self.cls_feats(backbone_feat)
        return self.init_filter(feats, bboxes_xyxy)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class _LinearBlock(nn.Module):
    """Flattened linear + BN + ReLU (iounet_head.py:21-55)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.features, dtype=self.dtype, name='fc')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


class IoUNetModule(nn.Module):
    """ATOM IoUNet (iounet_head.py:79-265): template modulation vectors +
    search-branch IoU prediction. Backbone feats: (layer2 512, layer3
    1024) at strides 8/16 — ``in_dim`` follows the reference config."""
    in_dim: Tuple[int, int] = (512, 1024)
    pred_in_dim: Tuple[int, int] = (256, 256)
    pred_inter_dim: Tuple[int, int] = (256, 256)
    dtype: Any = jnp.float32

    def setup(self):
        self.conv3_temp = _ConvBNReLU(128, dtype=self.dtype)
        self.fc3_temp = _ConvBNReLU(256, 3, 0, dtype=self.dtype)
        self.fc34_3_temp = _ConvBNReLU(self.pred_in_dim[0], 1, 0,
                                       dtype=self.dtype)
        self.conv4_temp = _ConvBNReLU(256, dtype=self.dtype)
        self.fc34_4_temp = _ConvBNReLU(self.pred_in_dim[1], 1, 0,
                                       dtype=self.dtype)
        self.conv3_search_0 = _ConvBNReLU(256, dtype=self.dtype)
        self.conv3_search_1 = _ConvBNReLU(self.pred_in_dim[0],
                                          dtype=self.dtype)
        self.conv4_search_0 = _ConvBNReLU(256, dtype=self.dtype)
        self.conv4_search_1 = _ConvBNReLU(self.pred_in_dim[1],
                                          dtype=self.dtype)
        self.fc3_search = _LinearBlock(self.pred_inter_dim[0],
                                       dtype=self.dtype)
        self.fc4_search = _LinearBlock(self.pred_inter_dim[1],
                                       dtype=self.dtype)
        self.iou_predictor = nn.Dense(1, dtype=self.dtype)

    def modulation(self, feat3, feat4, bbox_xyxy):
        """iounet_head.py:203-243; feats (1, H, W, C), bbox (4,)."""
        c3 = self.conv3_temp(feat3)
        r3 = prroi_pool(c3[0], bbox_xyxy[None], 3, 1 / 8)  # (1,3,3,128)
        f3 = self.fc3_temp(r3)                      # (1, 1, 1, 256)
        c4 = self.conv4_temp(feat4)
        r4 = prroi_pool(c4[0], bbox_xyxy[None], 1, 1 / 16)  # (1,1,1,256)
        cat = jnp.concatenate([f3, r4], axis=-1)
        return (self.fc34_3_temp(cat).reshape(1, 1, 1, -1),
                self.fc34_4_temp(cat).reshape(1, 1, 1, -1))

    def search_feats(self, feat3, feat4):
        c3 = self.conv3_search_1(self.conv3_search_0(feat3))
        c4 = self.conv4_search_1(self.conv4_search_0(feat4))
        return c3, c4

    def predict_iou(self, modulations, search_feats, proposals_xywh):
        """iounet_head.py:146-201; proposals (P, 4) xywh in sample
        coords."""
        m3, m4 = modulations
        c3, c4 = search_feats
        a3 = c3 * m3
        a4 = c4 * m4
        xyxy = jnp.concatenate(
            [proposals_xywh[:, :2],
             proposals_xywh[:, :2] + proposals_xywh[:, 2:]], axis=1)
        r3 = prroi_pool(a3[0], xyxy, 5, 1 / 8)
        r4 = prroi_pool(a4[0], xyxy, 3, 1 / 16)
        f3 = self.fc3_search(r3)
        f4 = self.fc4_search(r4)
        return self.iou_predictor(
            jnp.concatenate([f3, f4], axis=1))[:, 0]

    def __call__(self, feat3, feat4, bbox_xyxy, proposals_xywh):
        mod = self.modulation(feat3, feat4, bbox_xyxy)
        sf = self.search_feats(feat3, feat4)
        return self.predict_iou(mod, sf, proposals_xywh)


class PrDiMPModule(nn.Module):
    """Backbone (layer2+layer3) + classifier pieces + IoUNet."""
    cfg: PrDiMPTestCfg = PrDiMPTestCfg()
    # tiny-config backbone knobs (default = canonical r50)
    stage_blocks: Tuple[int, ...] = None
    base_width: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(out_indices=(1, 2),
                               stage_blocks=self.stage_blocks,
                               base_width=self.base_width,
                               dtype=self.dtype)
        self.classifier = PrDiMPClsModule(cfg=self.cfg, dtype=self.dtype)
        self.iounet = IoUNetModule(dtype=self.dtype)

    def extract(self, img):
        f3, f4 = self.backbone(img)
        return f3, f4

    def cls_feats(self, feat4):
        return self.classifier.cls_feats(feat4)

    def init_filter(self, cls_feats, bboxes_xyxy):
        return self.classifier.init_filter(cls_feats, bboxes_xyxy)

    def optimizer_params(self):
        return (self.classifier.log_step_length[0],
                self.classifier.filter_regular[0])

    def iou_modulation(self, feat3, feat4, bbox_xyxy):
        return self.iounet.modulation(feat3, feat4, bbox_xyxy)

    def iou_search_feats(self, feat3, feat4):
        return self.iounet.search_feats(feat3, feat4)

    def iou_predict(self, modulations, search_feats, proposals):
        return self.iounet.predict_iou(modulations, search_feats, proposals)

    def __call__(self, img, bbox_xyxy):
        f3, f4 = self.extract(img)
        cf = self.cls_feats(f4)
        filt = self.init_filter(cf, bbox_xyxy)
        mod = self.iou_modulation(f3, f4, bbox_xyxy[0])
        sf = self.iou_search_feats(f3, f4)
        iou = self.iou_predict(mod, sf, bbox_xyxy[:1].at[:, 2:].add(
            -bbox_xyxy[:1, :2]))
        return filt, iou


# ---------------------------------------------------------------------------
# localization (prdimp_cls_head.py:364-474)
# ---------------------------------------------------------------------------

def localize_target(scores: jnp.ndarray, prev_bbox: jnp.ndarray,
                    sample_center: jnp.ndarray, scale_factor: jnp.ndarray,
                    cfg: PrDiMPTestCfg):
    """Returns (new_center (2,), state int, max_score)."""
    h, w = scores.shape
    score_size = jnp.asarray([w, h], jnp.float32)
    output_size = score_size - (cfg.filter_size + 1) % 2
    score_center = score_size / 2

    flat = scores.reshape(-1)
    max_idx = jnp.argmax(flat)
    max_score = flat[max_idx]
    max_pos = jnp.asarray([max_idx % w, max_idx // w], jnp.float32)
    target_disp_map = max_pos - score_center
    ratio = (cfg.img_sample_size / output_size) * scale_factor
    target_disp = target_disp_map * ratio

    # mask the neighborhood of the target, find the second peak
    neigh = cfg.target_neighborhood_scale * prev_bbox[2:4] / ratio
    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    in_neigh = ((jnp.abs(gx - max_pos[0]) <= neigh[0] / 2)
                & (jnp.abs(gy - max_pos[1]) <= neigh[1] / 2))
    masked = jnp.where(in_neigh, 0.0, scores).reshape(-1)
    snd_idx = jnp.argmax(masked)
    snd_score = masked[snd_idx]
    snd_pos = jnp.asarray([snd_idx % w, snd_idx // w], jnp.float32)
    snd_disp_map = snd_pos - score_center
    snd_disp = snd_disp_map * ratio

    prev_disp_map = (prev_bbox[:2] - sample_center) / ratio

    t_diff = jnp.sqrt(((target_disp_map - prev_disp_map) ** 2).sum())
    d_diff = jnp.sqrt(((snd_disp_map - prev_disp_map) ** 2).sum())
    disp_thres = cfg.displacement_scale * jnp.sqrt(
        score_size[0] * score_size[1]) / 2

    not_found = max_score < cfg.no_target_min_score
    has_distractor = snd_score > cfg.distractor_thres * max_score
    hard_neg_only = ((snd_score > cfg.hard_neg_thres * max_score)
                     & (snd_score > cfg.no_target_min_score))

    # distractor sub-cases (prdimp_cls_head.py:443-466)
    case_a = (d_diff > disp_thres) & (t_diff < disp_thres)   # keep target
    case_b = (d_diff < disp_thres) & (t_diff > disp_thres)   # switch
    center = jnp.where(
        has_distractor & case_b & ~not_found,
        snd_disp + sample_center, target_disp + sample_center)
    state = jnp.where(
        not_found, NOT_FOUND,
        jnp.where(has_distractor,
                  jnp.where(case_a | case_b, HARD_NEGATIVE, UNCERTAIN),
                  jnp.where(hard_neg_only, HARD_NEGATIVE, NORMAL)))
    return center, state, max_score


# ---------------------------------------------------------------------------
# memory (prdimp_cls_head.py:143-307)
# ---------------------------------------------------------------------------

class PrDiMPMemory(NamedTuple):
    samples: jnp.ndarray        # (M, H, W, C)
    bboxes: jnp.ndarray         # (M, 4) cxcywh sample coords
    weights: jnp.ndarray        # (M,)
    num_samples: jnp.ndarray    # ()
    num_init: jnp.ndarray       # ()
    replace_ind: jnp.ndarray    # () — -1 before the first replacement


def update_memory(mem: PrDiMPMemory, feat: jnp.ndarray,
                  bbox: jnp.ndarray, lr: float,
                  cfg: PrDiMPTestCfg) -> PrDiMPMemory:
    """Weight-recurrence + slot replacement
    (prdimp_cls_head.py:214-307)."""
    m = mem.weights.shape[0]
    slot_free = mem.num_samples < m
    start = mem.num_init            # init samples are protected
    masked = jnp.where(jnp.arange(m) >= start, mem.weights, jnp.inf)
    replace = jnp.where(slot_free, mem.num_samples, jnp.argmin(masked))

    first = mem.replace_ind < 0
    w = jnp.where(first, mem.weights / (1 - lr), mem.weights)
    new_w = jnp.where(first, lr,
                      mem.weights[jnp.maximum(mem.replace_ind, 0)]
                      / (1 - lr))
    w = w.at[replace].set(new_w)
    w = w / w.sum()
    init_sum = jnp.where(jnp.arange(m) < mem.num_init, w, 0.0).sum()
    min_w = cfg.init_samples_min_weight
    later_sum = jnp.where(jnp.arange(m) >= mem.num_init, w, 0.0).sum()
    w_resc = w / (min_w + later_sum)
    w_resc = jnp.where(jnp.arange(m) < mem.num_init,
                       min_w / jnp.maximum(mem.num_init, 1), w_resc)
    w = jnp.where(init_sum < min_w, w_resc, w)

    return PrDiMPMemory(
        mem.samples.at[replace].set(feat),
        mem.bboxes.at[replace].set(bbox),
        w, mem.num_samples + 1, mem.num_init, replace)


# ---------------------------------------------------------------------------
# tracker
# ---------------------------------------------------------------------------

class PrDiMPState(NamedTuple):
    bbox: jnp.ndarray           # (4,) cxcywh, original image coords
    target_filter: jnp.ndarray  # (fs, fs, C)
    iou_modulation: Tuple[jnp.ndarray, jnp.ndarray]
    memory: PrDiMPMemory
    frame_num: jnp.ndarray


class PrDiMPTracker:
    """init/track over fixed shapes; the per-frame step is jitted, the
    state-dependent classifier-update schedule (which of 0/1/2-iteration
    optimizations to run, prdimp_cls_head.py:267-307) branches host-side
    on the returned state exactly like the reference."""

    def __init__(self, variables, cfg: PrDiMPTestCfg = PrDiMPTestCfg(),
                 dtype=jnp.float32,
                 module: Optional['PrDiMPModule'] = None):
        self.cfg = cfg
        self.module = module or PrDiMPModule(cfg, dtype=dtype)
        self.variables = variables
        self._track = jax.jit(self._track_impl)
        self._update = {
            n: jax.jit(partial(self._update_impl, num_iters=n))
            for n in {cfg.update_iters, cfg.hard_neg_iters}}
        self._mem_update = jax.jit(self._mem_update_impl)

    # ---- helpers --------------------------------------------------------
    def _apply(self, method, *args):
        return self.module.apply(self.variables, *args, method=method)

    def _gen_bbox(self, bbox, sample_center, resize_factor):
        """prdimp.py:223-240: original-image bbox -> sample coords."""
        center = (bbox[:2] - sample_center) / resize_factor \
            + self.cfg.img_sample_size / 2
        return jnp.concatenate([center, bbox[2:] / resize_factor])

    # ---- init -----------------------------------------------------------
    def init(self, img, bbox_xyxy, seed: int = 0):
        cfg = self.cfg
        img = jnp.asarray(img, jnp.float32)
        b = jnp.asarray(bbox_xyxy, jnp.float32)
        bbox = jnp.stack([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2,
                          b[2] - b[0], b[3] - b[1]])

        aug_size = int(cfg.img_sample_size * cfg.aug_expansion_factor)
        patch, coord = prdimp_crop(
            img, jnp.round(bbox),
            cfg.search_scale_factor * cfg.aug_expansion_factor, aug_size,
            inside=False)
        resize_factor = jnp.sqrt(coord[2] * coord[3]) / aug_size
        init_bbox = self._gen_bbox(bbox, jnp.round(bbox[:2]), resize_factor)

        # augmentations (prdimp.py:143-219: relative shifts, flip, blurs,
        # rotations, feature dropout). Center-crop the expanded patch to
        # sample_size with shifts.
        rng = np.random.RandomState(seed)
        s = cfg.img_sample_size
        off = (aug_size - s) // 2

        def shift_crop(p, shift):
            sx, sy = shift
            x0 = np.clip(off - sx, 0, aug_size - s)
            y0 = np.clip(off - sy, 0, aug_size - s)
            return p[y0:y0 + s, x0:x0 + s]

        def rand_shift():
            return tuple((rng.rand(2) - 0.5) * s
                         * cfg.random_shift_factor)

        patches = [shift_crop(patch, (0, 0))]
        bboxes = [init_bbox]
        for rel in cfg.relative_shifts:
            sh = (int(rel[0] * s / 2), int(rel[1] * s / 2))
            patches.append(shift_crop(patch, sh))
            bboxes.append(init_bbox + jnp.asarray(
                [sh[0], sh[1], 0, 0], jnp.float32))
        sh = tuple(int(v) for v in rand_shift())
        patches.append(shift_crop(patch[:, ::-1], sh))
        bboxes.append(init_bbox + jnp.asarray(
            [sh[0], sh[1], 0, 0], jnp.float32))
        for sig in cfg.blur_sigmas:
            blurred = _gauss_blur(patch, sig)
            sh = tuple(int(v) for v in rand_shift())
            patches.append(shift_crop(blurred, sh))
            bboxes.append(init_bbox + jnp.asarray(
                [sh[0], sh[1], 0, 0], jnp.float32))
        for ang in cfg.rotate_angles:
            rotated = _imrotate(patch, ang)
            sh = tuple(int(v) for v in rand_shift())
            patches.append(shift_crop(rotated, sh))
            bboxes.append(init_bbox + jnp.asarray(
                [sh[0], sh[1], 0, 0], jnp.float32))

        aug_imgs = jnp.stack(patches)
        aug_bboxes = jnp.stack(bboxes)

        f3, f4 = self._apply(PrDiMPModule.extract, aug_imgs)
        cls_feats = self._apply(PrDiMPModule.cls_feats, f4)
        # dropout augmentations on the first-sample features
        drops = []
        for p in cfg.dropout_probs:
            mask = (rng.rand(1, 1, 1, cls_feats.shape[-1]) > p) / (1 - p)
            drops.append(cls_feats[:1] * jnp.asarray(mask, jnp.float32))
            bboxes.append(init_bbox)
        cls_feats = jnp.concatenate([cls_feats] + drops, axis=0)
        aug_bboxes_all = jnp.stack(bboxes)

        xyxy = jnp.concatenate(
            [aug_bboxes_all[:, :2] - aug_bboxes_all[:, 2:] / 2,
             aug_bboxes_all[:, :2] + aug_bboxes_all[:, 2:] / 2], axis=1)
        init_filter = self._apply(PrDiMPModule.init_filter,
                                  cls_feats, xyxy)
        lsl, freg = self._apply(PrDiMPModule.optimizer_params)
        n = cls_feats.shape[0]
        weights = jnp.full((n,), 1.0 / n)
        target_filter = optimize_filter(
            init_filter, cls_feats, aug_bboxes_all, weights,
            self.cfg.init_update_iters, cfg, lsl, freg)

        # Memory holds at most sample_memory_size init samples; if the
        # augmentation set is larger (small test configs), keep the first m
        # the way the reference's init_memory slice assignment
        # (prdimp_cls_head.py:176-177) would with a big-enough memory —
        # rather than relying on config discipline.
        m = cfg.sample_memory_size
        nm = min(n, m)
        memory = PrDiMPMemory(
            jnp.zeros((m, *cls_feats.shape[1:])).at[:nm].set(cls_feats[:nm]),
            jnp.zeros((m, 4)).at[:nm].set(aug_bboxes_all[:nm]),
            jnp.zeros((m,)).at[:nm].set(1.0 / nm),
            jnp.asarray(nm), jnp.asarray(nm), jnp.asarray(-1))

        mod = self._apply(PrDiMPModule.iou_modulation, f3[:1], f4[:1],
                          xyxy[0])
        return PrDiMPState(bbox, target_filter, mod, memory,
                           jnp.asarray(1))

    # ---- track ----------------------------------------------------------
    def _track_impl(self, img, state: PrDiMPState, rand_jitter):
        cfg = self.cfg
        patch, coord = prdimp_crop(img, jnp.round(state.bbox),
                                   cfg.search_scale_factor,
                                   cfg.img_sample_size, inside=True)
        sample_center = coord[:2]
        scale_factor = jnp.sqrt(coord[2] * coord[3]) / cfg.img_sample_size

        f3, f4 = self._apply(PrDiMPModule.extract, patch[None])
        cls_feats = self._apply(PrDiMPModule.cls_feats, f4)
        raw = apply_filter(cls_feats, state.target_filter)[0]
        scores = jax.nn.softmax(raw.reshape(-1)).reshape(raw.shape)

        center, loc_state, max_score = localize_target(
            scores, state.bbox, sample_center, scale_factor, cfg)

        # clip the center inside the image (prdimp.py:278-285)
        h, w = img.shape[0], img.shape[1]
        inside_offset = (cfg.bbox_inside_ratio - 0.5) * state.bbox[2:4]
        img_sz = jnp.asarray([w, h], jnp.float32)
        clipped = jnp.maximum(jnp.minimum(center, img_sz - inside_offset),
                              inside_offset)
        bbox_loc = state.bbox.at[:2].set(
            jnp.where(loc_state != NOT_FOUND, clipped, state.bbox[:2]))

        # IoUNet refinement (iounet_head.py:357-441)
        cls_bbox = self._gen_bbox(bbox_loc, sample_center, scale_factor)
        sq = jnp.sqrt(cls_bbox[2] * cls_bbox[3])
        rand_factor = sq * jnp.asarray(
            [cfg.box_jitter_pos, cfg.box_jitter_pos,
             cfg.box_jitter_sz, cfg.box_jitter_sz])
        jitter = (rand_jitter - 0.5) * rand_factor
        min_edge = jnp.min(cls_bbox[2:]) / 3
        cand_center = cls_bbox[None, :2] + jitter[:, :2]
        cand_size = jnp.clip(cls_bbox[None, 2:] + jitter[:, 2:],
                             min_edge, None)
        cands = jnp.concatenate(
            [jnp.concatenate([cls_bbox[None, :2], cls_bbox[None, 2:]], 1),
             jnp.concatenate([cand_center, cand_size], 1)], axis=0)
        # cxcywh -> xywh
        cands_xywh = jnp.concatenate(
            [cands[:, :2] - cands[:, 2:] / 2, cands[:, 2:]], axis=1)

        sf = self._apply(PrDiMPModule.iou_search_feats, f3, f4)
        sz_norm = cands_xywh[:1, 2:]

        def rel(b):
            c = b[:, :2] + b[:, 2:] / 2
            return jnp.concatenate([c / sz_norm, jnp.log(b[:, 2:]
                                                         / sz_norm)], 1)

        def unrel(r):
            size = jnp.exp(r[:, 2:]) * sz_norm
            c = r[:, :2] * sz_norm
            return jnp.concatenate([c - size / 2, size], 1)

        step0 = jnp.asarray([cfg.box_refine_step_length[0]] * 2
                            + [cfg.box_refine_step_length[1]] * 2)

        def refine_body(i, carry):
            r, step = carry
            grad = jax.grad(lambda rr: self._apply(
                PrDiMPModule.iou_predict, state.iou_modulation, sf,
                unrel(rr)).sum())(r)
            return r + step * grad, step * cfg.box_refine_step_decay

        r0 = rel(cands_xywh)
        r_fin, _ = jax.lax.fori_loop(0, cfg.box_refine_iter, refine_body,
                                     (r0, step0[None, :]))
        out_xywh = unrel(r_fin)
        out_iou = self._apply(PrDiMPModule.iou_predict,
                              state.iou_modulation, sf, out_xywh)
        out_xywh = out_xywh.at[:, 2:].set(jnp.clip(out_xywh[:, 2:], 1,
                                                   None))
        ar = out_xywh[:, 2] / out_xywh[:, 3]
        keep = (ar < cfg.max_aspect_ratio) & (ar > 1 / cfg.max_aspect_ratio)
        iou_masked = jnp.where(keep, out_iou, -1e9)
        k = cfg.iounet_topk
        top_iou, top_idx = jax.lax.top_k(iou_masked, k)
        top = out_xywh[top_idx]
        pred = jnp.where((top_iou > -1e8)[:, None], top, 0.0).sum(0) \
            / jnp.maximum((top_iou > -1e8).sum(), 1)
        new_center = (pred[:2] + pred[2:] / 2
                      - cfg.img_sample_size / 2) * scale_factor \
            + sample_center
        new_size = pred[2:] * scale_factor
        refined = jnp.concatenate([new_center, new_size])
        use_refine = (loc_state != NOT_FOUND) & keep.any()
        bbox_out = jnp.where(use_refine, refined, bbox_loc)

        target_bbox_sample = self._gen_bbox(bbox_out, sample_center,
                                            scale_factor)
        new_state = state._replace(bbox=bbox_out,
                                   frame_num=state.frame_num + 1)
        return (new_state, cls_feats[0], target_bbox_sample,
                loc_state, max_score)

    def _mem_update_impl(self, state: PrDiMPState, feat, bbox_sample, lr):
        return state._replace(memory=update_memory(
            state.memory, feat, bbox_sample, lr, self.cfg))

    def _update_impl(self, state: PrDiMPState, num_iters):
        lsl, freg = self._apply(PrDiMPModule.optimizer_params)
        mem = state.memory
        live = jnp.arange(mem.weights.shape[0]) < jnp.minimum(
            mem.num_samples, mem.weights.shape[0])
        w = jnp.where(live, mem.weights, 0.0)
        filt = optimize_filter(state.target_filter, mem.samples,
                               mem.bboxes, w, num_iters, self.cfg,
                               lsl, freg)
        return state._replace(target_filter=filt)

    def track(self, img, state: PrDiMPState, rng=None):
        cfg = self.cfg
        rng = rng or np.random
        jitter = jnp.asarray(
            rng.rand(cfg.num_init_random_boxes, 4), jnp.float32)
        state, feat, bbox_sample, loc_state, score = self._track(
            jnp.asarray(img, jnp.float32), state, jitter)
        loc = int(loc_state)

        # classifier update schedule (prdimp.py:288-300,
        # prdimp_cls_head.py:267-307)
        if loc not in (NOT_FOUND, UNCERTAIN):
            hard_neg = loc == HARD_NEGATIVE
            lr = cfg.hard_neg_lr if hard_neg else cfg.normal_lr
            if hard_neg:
                state = self._mem_update(state, feat, bbox_sample,
                                         jnp.float32(lr))
                state = self._update[cfg.hard_neg_iters](state)
            elif (int(state.frame_num) - 1) % cfg.train_skipping == 0:
                state = self._mem_update(state, feat, bbox_sample,
                                         jnp.float32(lr))
                state = self._update[cfg.update_iters](state)
        b = state.bbox
        xyxy = jnp.stack([b[0] - b[2] / 2, b[1] - b[3] / 2,
                          b[0] + b[2] / 2, b[1] + b[3] / 2])
        return state, (xyxy, score)


def _gauss_blur(img: jnp.ndarray, sigma: Tuple[float, float]) -> jnp.ndarray:
    """Separable Gaussian blur (mmtrack.utils.gauss_blur semantics,
    kernel_size = ceil(2*sigma))."""
    out = img
    for axis, s in enumerate(sigma):
        if s <= 0:
            continue
        k = int(math.ceil(2 * s))
        x = jnp.arange(-k, k + 1, dtype=jnp.float32)
        w = jnp.exp(-x ** 2 / (2 * s ** 2))
        w = w / w.sum()
        if axis == 0:   # vertical
            kernel = w[:, None, None, None]
            pad = [(k, k), (0, 0)]
        else:
            kernel = w[None, :, None, None]
            pad = [(0, 0), (k, k)]
        c = out.shape[-1]
        out = jax.lax.conv_general_dilated(
            out[None], jnp.tile(kernel, (1, 1, 1, c)), (1, 1),
            padding=pad, feature_group_count=c,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0]
    return out


def _imrotate(img: jnp.ndarray, angle: float) -> jnp.ndarray:
    """``mmcv.imrotate(img, angle, border_mode='replicate')`` semantics
    (reference first-frame rotation aug, prdimp.py:197-211): rotate about
    the pixel center ((w-1)/2, (h-1)/2), positive angle clockwise
    (mmcv negates before cv2.getRotationMatrix2D), bilinear sampling with
    edge replication, same output size.  A/B'd against the actual
    cv2.warpAffine chain in tests/test_prdimp_rotation.py."""
    h, w = img.shape[:2]
    cx, cy = (w - 1) * 0.5, (h - 1) * 0.5
    # forward matrix M = getRotationMatrix2D(center, -angle, 1); warpAffine
    # samples src at M^-1 @ dst.  For a pure rotation the inverse is the
    # transpose of the rotation part about the same center.
    a = math.radians(-angle)
    ca, sa = math.cos(a), math.sin(a)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    dx, dy = xs - cx, ys - cy
    sx = ca * dx - sa * dy + cx     # inverse rotation (transpose)
    sy = sa * dx + ca * dy + cy
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx, fy = sx - x0, sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    fx, fy = fx[..., None], fy[..., None]
    v00, v01 = img[y0i, x0i], img[y0i, x1i]
    v10, v11 = img[y1i, x0i], img[y1i, x1i]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


# ---------------------------------------------------------------------------
# training losses (prdimp_cls_head.py:599-710, filter_optimizer.py:257-285,
# iounet_head.py:442-653)
# ---------------------------------------------------------------------------

def prdimp_cls_train_loss(init_filter: jnp.ndarray, feat: jnp.ndarray,
                          bboxes_cxcywh: jnp.ndarray, num_iters: int,
                          cfg: PrDiMPTestCfg, log_step_length,
                          filter_regular_param) -> jnp.ndarray:
    """Unrolled-optimizer classification loss: the probabilistic KL
    objective (sample-weighted ``logsumexp(scores) - sum(density *
    scores)`` + filter L2) summed over every optimizer iterate including
    the initial and final filters (filter_optimizer.py:174-213,
    _compute_loss :257-285). Differentiable through the optimizer steps
    (the reference trains exactly this unrolled program)."""
    fh, fw = init_filter.shape[0], init_filter.shape[1]
    n = feat.shape[0]
    out_hw = (feat.shape[1] + (fh + 1) % 2, feat.shape[2] + (fw + 1) % 2)
    regular = jnp.maximum(filter_regular_param ** 2,
                          cfg.min_filter_regular ** 2)
    offset = jnp.asarray([fh % 2, fw % 2], jnp.float32) / 2.0
    centers = bboxes_cxcywh[:, :2] / cfg.feat_stride
    density = gen_label_density(centers[:, ::-1] - offset, out_hw,
                                cfg.gauss_sigma)
    w = jnp.full((n,), 1.0 / n)

    def iter_loss(f):
        raw = apply_filter(feat, f)
        lse = jax.nn.logsumexp(raw.reshape(n, -1), axis=-1)
        dot = (density * raw).sum(axis=(1, 2))
        return (w * (lse - dot)).sum() + regular * (f ** 2).sum() / n

    total = iter_loss(init_filter)
    f = init_filter
    for _ in range(num_iters):
        f = optimize_filter(f, feat, bboxes_cxcywh, w, 1, cfg,
                            log_step_length, filter_regular_param)
        total = total + iter_loss(f)
    return total / (num_iters + 1)


def sample_gmm_proposals(gt_xywh: jnp.ndarray, key,
                         num_samples: int = 128,
                         proposals_sigma=((0.05, 0.05), (0.5, 0.5)),
                         gt_sigma=(0.05, 0.05)):
    """GMM proposal sampling in relative box coords
    (iounet_head.py:442-498): per sample pick a sigma component, draw a
    centered gaussian perturbation, map back to xywh. Returns
    (proposals_xywh (S, 4), proposal_density (S,), gt_density (S,))."""
    k1, k2 = jax.random.split(key)
    sigmas = jnp.asarray([[c, c, s, s] for c, s in proposals_sigma])
    comp = jax.random.randint(k1, (num_samples,), 0, sigmas.shape[0])
    sig = sigmas[comp]                                   # (S, 4)
    eps = jax.random.normal(k2, (num_samples, 4)) * sig

    def gauss_density_centered(x, std):
        return jnp.prod(
            jnp.exp(-0.5 * (x / std) ** 2) /
            (jnp.sqrt(2 * jnp.pi) * std), axis=-1)

    # mixture density over all components
    dens = jnp.stack([gauss_density_centered(eps, sigmas[i][None])
                      for i in range(sigmas.shape[0])], axis=0)
    proposal_density = dens.mean(axis=0)
    gt_std = jnp.asarray([gt_sigma[0], gt_sigma[0],
                          gt_sigma[1], gt_sigma[1]])
    gt_density = gauss_density_centered(eps, gt_std[None])

    wh = gt_xywh[2:]
    c = gt_xywh[:2] + wh / 2
    sz_norm = wh
    rel_mean = jnp.concatenate([c / sz_norm, jnp.log(wh / sz_norm)])
    rel = rel_mean[None] + eps
    size = jnp.exp(rel[:, 2:]) * sz_norm[None]
    center = rel[:, :2] * sz_norm[None]
    proposals = jnp.concatenate([center - size / 2, size], axis=1)
    return proposals, proposal_density, gt_density


def kl_mc_loss(scores: jnp.ndarray, sample_density: jnp.ndarray,
               gt_density: jnp.ndarray) -> jnp.ndarray:
    """KL-divergence Monte-Carlo regression loss (the KLMCLoss the
    reference's IoUNet trains with): ``logsumexp(s - log q) - log N -
    mean(s * p / q)`` per sequence, averaged."""
    n = scores.shape[-1]
    exp_val = scores - jnp.log(jnp.maximum(sample_density, 1e-12))
    l = jax.nn.logsumexp(exp_val, axis=-1) - jnp.log(n) \
        - (scores * gt_density / jnp.maximum(sample_density, 1e-12)) \
        .mean(axis=-1)
    return l.mean()
