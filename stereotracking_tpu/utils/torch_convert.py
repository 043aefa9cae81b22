"""Convert mmyolo YOLOX-S torch checkpoints to this framework's Flax params.

Capability parity with the reference's ``ColorPretrained`` init
(/root/reference/mmtrack/models/detectors/yolo_detector_disparity_v1.py:144-166):
load a COCO-pretrained YOLOX state dict, duplicate the RGB ``stem``/``stage1``
weights into the disparity branch (``disp_stem``/``disp_stage1``), and skip
shape-mismatched heads (80-class COCO vs 1-class drone) like mmengine's
``load_state_dict(strict=False)``.

Key mapping (torch module path -> flax tree path):
    backbone.stem.conv            -> backbone/stem/conv
    backbone.stageN.0             -> backbone/stageN/conv
    backbone.stage4.1 (SPPF)      -> backbone/stage4/spp
    backbone.stageN.<last> (CSP)  -> backbone/stageN/csp
    neck.reduce_layers.k          -> neck/reduce_k           (etc.)
    bbox_head.head_module.multi_level_cls_convs.l.i -> bbox_head/cls_convs_l_i

Conv kernels transpose OIHW -> HWIO; BN splits into params (scale/bias) and
batch_stats (mean/var).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _split_convmodule(src: Dict[str, np.ndarray], prefix: str):
    """torch ConvModule tensors -> (conv_params, bn_params, bn_stats)."""
    w = src.get(f'{prefix}.conv.weight')
    if w is None:
        return None
    out = {'conv': {'kernel': np.transpose(w, (2, 3, 1, 0))}}
    if f'{prefix}.bn.weight' in src:
        out['bn'] = {'scale': src[f'{prefix}.bn.weight'],
                     'bias': src[f'{prefix}.bn.bias']}
        stats = {'bn': {'mean': src[f'{prefix}.bn.running_mean'],
                        'var': src[f'{prefix}.bn.running_var']}}
    else:
        stats = {}
    return out, stats


def _plain_conv(src: Dict[str, np.ndarray], prefix: str):
    w = src.get(f'{prefix}.weight')
    if w is None:
        return None
    out = {'kernel': np.transpose(w, (2, 3, 1, 0))}
    if f'{prefix}.bias' in src:
        out['bias'] = src[f'{prefix}.bias']
    return out


def _csp_layer(src, prefix):
    params, stats = {}, {}
    for name in ('main_conv', 'short_conv', 'final_conv'):
        r = _split_convmodule(src, f'{prefix}.{name}')
        if r:
            params[name], s = r
            stats[name] = s
    i = 0
    while f'{prefix}.blocks.{i}.conv1.conv.weight' in src:
        bp, bs = {}, {}
        for cname in ('conv1', 'conv2'):
            r = _split_convmodule(src, f'{prefix}.blocks.{i}.{cname}')
            if r:
                bp[cname], s = r
                bs[cname] = s
        params[f'blocks_{i}'] = bp
        stats[f'blocks_{i}'] = bs
        i += 1
    return params, stats


def _stage(src, prefix, has_spp):
    params, stats = {}, {}
    r = _split_convmodule(src, f'{prefix}.0')
    if r:
        params['conv'], stats['conv'] = r
    csp_idx = 2 if has_spp else 1
    if has_spp:
        sp, ss = {}, {}
        for cname in ('conv1', 'conv2'):
            r = _split_convmodule(src, f'{prefix}.1.{cname}')
            if r:
                sp[cname], s = r
                ss[cname] = s
        params['spp'], stats['spp'] = sp, ss
    cp, cs = _csp_layer(src, f'{prefix}.{csp_idx}')
    params['csp'], stats['csp'] = cp, cs
    return params, stats


def convert_yolox_state_dict(src: Dict[str, np.ndarray],
                             dual_branch: bool = True,
                             num_levels: int = 3,
                             stacked_convs: int = 2
                             ) -> Tuple[Dict, Dict]:
    """torch state dict (numpy values) -> (params, batch_stats) trees."""
    src = {k[9:] if k.startswith('detector.') else k: np.asarray(v)
           for k, v in src.items()}

    params: Dict[str, Any] = {'backbone': {}, 'neck': {}, 'bbox_head': {}}
    stats: Dict[str, Any] = {'backbone': {}, 'neck': {}, 'bbox_head': {}}

    # backbone
    r = _split_convmodule(src, 'backbone.stem.conv')
    if r:
        params['backbone']['stem'] = {'conv': r[0]}
        stats['backbone']['stem'] = {'conv': r[1]}
    for i in range(1, 5):
        p, s = _stage(src, f'backbone.stage{i}', has_spp=(i == 4))
        params['backbone'][f'stage{i}'] = p
        stats['backbone'][f'stage{i}'] = s

    if dual_branch:
        # ColorPretrained duplication: RGB stem/stage1 -> disparity branch
        import copy
        params['backbone']['disp_stem'] = copy.deepcopy(
            params['backbone']['stem'])
        stats['backbone']['disp_stem'] = copy.deepcopy(
            stats['backbone']['stem'])
        params['backbone']['disp_stage1'] = copy.deepcopy(
            params['backbone']['stage1'])
        stats['backbone']['disp_stage1'] = copy.deepcopy(
            stats['backbone']['stage1'])

    # neck
    for k in range(2):
        r = _split_convmodule(src, f'neck.reduce_layers.{k}')
        if r:
            params['neck'][f'reduce_{k}'] = r[0]
            stats['neck'][f'reduce_{k}'] = r[1]
        p, s = _csp_layer(src, f'neck.top_down_blocks.{k}')
        params['neck'][f'top_down_{k}'] = p
        stats['neck'][f'top_down_{k}'] = s
        r = _split_convmodule(src, f'neck.downsamples.{k}')
        if r:
            params['neck'][f'downsample_{k}'] = r[0]
            stats['neck'][f'downsample_{k}'] = r[1]
        p, s = _csp_layer(src, f'neck.bottom_up_blocks.{k}')
        params['neck'][f'bottom_up_{k}'] = p
        stats['neck'][f'bottom_up_{k}'] = s
    for k in range(num_levels):
        r = _split_convmodule(src, f'neck.out_convs.{k}')
        if r:
            params['neck'][f'out_{k}'] = r[0]
            stats['neck'][f'out_{k}'] = r[1]

    # head
    hm = 'bbox_head.head_module'
    for lvl in range(num_levels):
        for i in range(stacked_convs):
            for branch, ours in (('multi_level_cls_convs', 'cls_convs'),
                                 ('multi_level_reg_convs', 'reg_convs')):
                r = _split_convmodule(src, f'{hm}.{branch}.{lvl}.{i}')
                if r:
                    params['bbox_head'][f'{ours}_{lvl}_{i}'] = r[0]
                    stats['bbox_head'][f'{ours}_{lvl}_{i}'] = r[1]
        for branch, ours in (('multi_level_conv_cls', 'conv_cls'),
                             ('multi_level_conv_reg', 'conv_reg'),
                             ('multi_level_conv_obj', 'conv_obj')):
            r = _plain_conv(src, f'{hm}.{branch}.{lvl}')
            if r:
                params['bbox_head'][f'{ours}_{lvl}'] = r
    return params, stats


def merge_into(target: Dict, source: Dict, path: str = '') -> list:
    """Copy matching-shape leaves of ``source`` into ``target`` (in place);
    returns list of skipped key paths (shape mismatch / unknown), the
    ``load_state_dict(strict=False)`` analog."""
    skipped = []
    for k, v in source.items():
        if k not in target:
            skipped.append(f'{path}/{k} (unknown)')
            continue
        if isinstance(v, dict):
            skipped += merge_into(target[k], v, f'{path}/{k}')
        else:
            if tuple(np.shape(target[k])) == tuple(np.shape(v)):
                target[k] = np.asarray(v, dtype=np.asarray(target[k]).dtype)
            else:
                skipped.append(
                    f'{path}/{k} (shape {np.shape(v)} vs '
                    f'{np.shape(target[k])})')
    return skipped


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into numpy (torch CPU)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('state_dict', ckpt)
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, 'detach')}
