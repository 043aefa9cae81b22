"""User-facing inference APIs.

Equivalents of the reference's ``init_model``/``inference_mot``
(/root/reference/mmtrack/apis/inference.py:22-129): build a model from a
config file (+optional checkpoint), then feed it frames one by one; all
device work happens in the single jitted per-frame program.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..models.mot import FrameResult, OCSORTDisparity
from ..models.preprocessor import padded_shape, preprocess_frame
from ..data import transforms as T
from .builder import build_model


def _is_torch_ckpt(path: str) -> bool:
    return str(path).endswith(('.pth', '.pt'))


def _merge_converted(converted, init_vars, checkpoint: str, zoo_name: str):
    """Merge a converted reference torch checkpoint into freshly-initialized
    variables (the reference ``init_model`` -> ``load_checkpoint`` path,
    apis/inference.py:22-97, for published torch checkpoints).  Raises on
    shape mismatches so a wrong architecture/checkpoint pairing fails
    loudly."""
    import warnings

    from ..utils import torch_convert as TC

    def as_mutable(t):
        return ({k: as_mutable(v) for k, v in t.items()}
                if isinstance(t, dict) else t)

    target = as_mutable(dict(init_vars))
    skipped = TC.merge_into(target, converted)
    mismatched = [s for s in skipped if '(shape' in s]
    if mismatched:
        raise ValueError(
            f'checkpoint {checkpoint!r} does not fit model '
            f'{zoo_name!r}: {mismatched[:5]}')
    if skipped:
        warnings.warn(f'{len(skipped)} unmatched checkpoint entries '
                      f'(first: {skipped[0]})')
    return target


def init_model(config: str | dict, checkpoint: Optional[str] = None,
               input_shape: Tuple[int, int] = (736, 1280),
               dtype=None) -> OCSORTDisparity:
    """Config path/dict (+ optional checkpoint: orbax/msgpack, or a
    reference torch ``.pth`` which is converted on load) -> model."""
    cfg = load_config(config) if isinstance(config, str) else config
    variables = None
    if checkpoint is not None:
        if _is_torch_ckpt(checkpoint):
            from ..utils import torch_convert as TC
            variables = TC.convert_zoo_checkpoint(checkpoint, 'mot')
        else:
            from ..train.checkpoint import load_checkpoint
            variables = load_checkpoint(checkpoint)
    model = build_model(cfg, variables=variables, input_shape=input_shape,
                        dtype=dtype)
    model.config_dict = cfg
    return model


def inference_mot(model: OCSORTDisparity, img: np.ndarray,
                  disparity: np.ndarray, frame_id: int,
                  depth: Optional[np.ndarray] = None,
                  scale: Optional[Tuple[int, int]] = None) -> Dict:
    """Track one frame.

    Args:
        model: from ``init_model``.
        img: (H, W, 3) uint8 BGR left frame.
        disparity: (H, W) uint16 SGBM /16 fixed-point disparity
            (65535 = invalid) or float32 already-postprocessed disparity.
        frame_id: 0-based; 0 resets the tracker.
        depth: optional (H, W) float32 GT depth in meters.
        scale: optional (h, w) keep-ratio resize target (reference
            test-pipeline Resize); default: no resize.

    Returns dict with 'det_instances' and 'track_instances' numpy arrays.
    """
    sample = dict(img=img)
    if disparity.dtype == np.uint16:
        sample.update(T.disparity_postprocess(disparity))
    else:
        sample['disp_postp'] = disparity.astype(np.float32)
        sample['disp_mask'] = (disparity > 0).astype(np.float32)
    if depth is not None:
        sample['depth_postp'] = depth.astype(np.float32)

    sf = (1.0, 1.0)
    if scale is not None:
        sample = T.resize_keep_ratio(sample, scale)
        sf = sample['scale_factor']

    h, w = sample['img'].shape[:2]
    oh, ow = padded_shape(h, w)
    disp_fixed = (sample['disp_postp'] * 16.0).astype(np.uint16)
    disp_fixed = np.where(sample['disp_mask'] > 0, disp_fixed,
                          np.uint16(65535)).astype(np.uint16)
    if getattr(model.cfg, 'stem_backend', 'xla') == 'pallas':
        # production serving path: raw-frame program with host-packed
        # pallas Focus stems (config key model.stem_backend)
        img_u8 = np.clip(np.rint(np.asarray(sample['img'], np.float32)),
                         0, 255).astype(np.uint8)
        res: FrameResult = model.track_raw(
            img_u8, disp_fixed, frame_id, scale_factor=sf,
            depth_raw=None if depth is None else sample['depth_postp'])
    else:
        inputs = preprocess_frame(
            jnp.asarray(sample['img']), jnp.asarray(disp_fixed),
            oh, ow,
            depth_raw=None if depth is None else
            jnp.asarray(sample['depth_postp']))
        res = model.track(inputs, frame_id, scale_factor=sf)
    # ONE batched D2H transfer: per-array np.asarray pays a ~28 ms tunnel
    # round trip each on the dev TPU (measured in tools/test.py's loop)
    res = jax.device_get(res)
    dv = np.asarray(res.det_valid)
    tv = np.asarray(res.track_valid)
    return dict(
        det_instances=dict(
            bboxes=np.asarray(res.det_bboxes)[dv],
            scores=np.asarray(res.det_scores)[dv],
            labels=np.asarray(res.det_labels)[dv]),
        track_instances=dict(
            bboxes=np.asarray(res.track_bboxes)[tv],
            scores=np.asarray(res.track_scores)[tv],
            labels=np.asarray(res.track_labels)[tv],
            instances_id=np.asarray(res.track_ids)[tv],
            depth=np.asarray(res.track_depths)[tv],
            gt_depth=np.asarray(res.track_gt_depths)[tv],
            scales=np.asarray(res.track_scales)[tv]))


def init_sot_model(tracker: str = 'siamrpn', variables=None,
                   checkpoint: Optional[str] = None,
                   rng_seed: int = 0, **cfg_kwargs):
    """Build a single-object tracker (reference ``inference_sot`` stack,
    apis/inference.py:132-175).

    ``tracker``: 'siamrpn' | 'stark' | 'prdimp'.  ``checkpoint`` may be a
    native orbax/msgpack file or a reference torch ``.pth`` (converted on
    load).  Without either, the model is randomly initialized
    (capability/API use)."""
    import jax

    converted = None
    if variables is None and checkpoint is not None:
        if _is_torch_ckpt(checkpoint):
            from ..utils import torch_convert as TC
            converted = TC.convert_zoo_checkpoint(checkpoint, tracker)
        else:
            from ..train.checkpoint import load_checkpoint
            variables = load_checkpoint(checkpoint)

    def with_ckpt(init_vars):
        if converted is not None:
            return _merge_converted(converted, init_vars, checkpoint,
                                    tracker)
        return init_vars

    if tracker == 'siamrpn':
        from ..models.sot import SiamRPNModule, SiamRPNTestCfg, SiamRPNTracker
        cfg = SiamRPNTestCfg(**cfg_kwargs)
        if variables is None:
            m = SiamRPNModule(center_size=cfg.center_size)
            z = jnp.zeros((1, cfg.exemplar_size, cfg.exemplar_size, 3))
            x = jnp.zeros((1, cfg.search_size, cfg.search_size, 3))
            variables = m.init(jax.random.PRNGKey(rng_seed), z, x)
        return SiamRPNTracker(with_ckpt(variables), cfg)
    if tracker == 'prdimp':
        from ..models.sot.prdimp import (PrDiMPModule, PrDiMPTestCfg,
                                         PrDiMPTracker)
        cfg = PrDiMPTestCfg(**cfg_kwargs)
        if variables is None:
            m = PrDiMPModule(cfg)
            s = cfg.img_sample_size
            variables = m.init(jax.random.PRNGKey(rng_seed),
                               jnp.zeros((1, s, s, 3)),
                               jnp.asarray([[s * 0.25, s * 0.25,
                                             s * 0.75, s * 0.75]]))
        return PrDiMPTracker(with_ckpt(variables), cfg)
    if tracker == 'stark':
        from ..models.sot.stark import StarkModule, StarkTestCfg, StarkTracker
        cfg = StarkTestCfg(**cfg_kwargs)
        if variables is None:
            m = StarkModule(cfg)
            z = jnp.zeros((1, cfg.template_size, cfg.template_size, 3))
            zm = jnp.zeros((1, cfg.template_size, cfg.template_size))
            x = jnp.zeros((1, cfg.search_size, cfg.search_size, 3))
            xm = jnp.zeros((1, cfg.search_size, cfg.search_size))
            variables = m.init(jax.random.PRNGKey(rng_seed),
                               [z, z], [zm, zm], x, xm)
        return StarkTracker(with_ckpt(variables), cfg)
    raise ValueError(f'unknown SOT tracker {tracker!r}')


def inference_sot(model, img: np.ndarray, init_bbox=None, state=None):
    """Per-frame SOT API (reference apis/inference.py:132-175 shape):
    pass ``init_bbox`` (xyxy) on the first frame; thread the returned
    ``state`` afterwards. Returns (state, dict(bboxes, scores))."""
    if init_bbox is not None:
        state = model.init(img, init_bbox)
        x1, y1, x2, y2 = [float(v) for v in init_bbox]
        return state, dict(bboxes=np.asarray([[x1, y1, x2, y2]]),
                           scores=np.asarray([1.0]))
    assert state is not None, 'provide init_bbox on the first frame'
    state, (bbox, score) = model.track(img, state)
    return state, dict(bboxes=np.asarray(bbox)[None],
                       scores=np.asarray([float(score)]))


def init_vid_model(method: str = 'dff', variables=None, cfg=None,
                   checkpoint: Optional[str] = None,
                   rng_seed: int = 0, img_hw: Tuple[int, int] = (384, 512),
                   **kwargs):
    """Build a streaming video-object-detection model (reference
    ``inference_vid`` stack, apis/inference.py:178-223).

    ``method``: 'dff' | 'fgfa' | 'selsa'.  ``checkpoint`` may be a native
    orbax/msgpack file or a reference torch ``.pth`` (converted on load).
    Without either, the model is randomly initialized (API/capability
    use)."""
    import jax

    from ..models.two_stage import FasterRCNN, TwoStageConfig
    from ..models.vid import DFF, FGFA, SELSA
    from ..models.vid.flownet import FlowNetSimple
    from ..models.vid.vid_models import EmbedAggregator

    converted = None
    if variables is None and checkpoint is not None:
        if _is_torch_ckpt(checkpoint):
            from ..utils import torch_convert as TC
            converted = TC.convert_zoo_checkpoint(checkpoint, method)
        else:
            from ..train.checkpoint import load_checkpoint
            variables = load_checkpoint(checkpoint)

    def with_ckpt(init_vars):
        if converted is not None:
            return _merge_converted(converted, init_vars, checkpoint,
                                    method)
        return init_vars

    cfg = cfg or TwoStageConfig()
    h, w = img_hw
    img0 = jnp.zeros((1, h, w, 3))
    if method == 'selsa':
        if variables is None:
            variables = FasterRCNN(cfg, selsa=True).init(
                jax.random.PRNGKey(rng_seed), img0)
        return SELSA(with_ckpt(variables), cfg, **kwargs)
    if variables is None:
        det = FasterRCNN(cfg)
        dv = det.init(jax.random.PRNGKey(rng_seed), img0)
        fv = FlowNetSimple().init(jax.random.PRNGKey(rng_seed + 1),
                                  jnp.zeros((1, h, w, 6)))
        variables = {'detector': dv, 'flownet': fv}
        if method == 'fgfa':
            feat = jax.eval_shape(
                lambda x: det.apply(dv, x, method=FasterRCNN.extract_feat),
                img0)
            c = feat.shape[-1]
            variables['aggregator'] = EmbedAggregator().init(
                jax.random.PRNGKey(rng_seed + 2),
                jnp.zeros((1,) + feat.shape[1:]),
                jnp.zeros((3,) + feat.shape[1:]), jnp.ones((3,), bool))
    variables = with_ckpt(variables)
    if method == 'dff':
        return DFF(variables, cfg, **kwargs)
    if method == 'fgfa':
        return FGFA(variables, cfg, **kwargs)
    raise ValueError(f'unknown VID method {method!r}')


def inference_vid(model, img: np.ndarray, frame_id: int, state=None):
    """Per-frame VID API: thread ``state`` between frames (for SELSA it is
    the ring of recent reference frames). Returns
    (state, dict(bboxes, scores, labels)) with invalid rows dropped."""
    from ..models.vid import SELSA

    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 3:
        img = img[None]
    if isinstance(model, SELSA):
        if state is None or frame_id == 0:
            state = jnp.repeat(img, model.num_refs, axis=0)
        res = model.detect(img, state)
        state = jnp.concatenate([state[1:], img], axis=0)
    else:
        state, res = model.detect(img, frame_id,
                                  None if frame_id == 0 else state)
    v = np.asarray(res.valid)
    return state, dict(bboxes=np.asarray(res.boxes)[v],
                       scores=np.asarray(res.scores)[v],
                       labels=np.asarray(res.labels)[v])
