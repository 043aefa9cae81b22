"""Torch-checkpoint conversion tests using a fabricated mmyolo-style state
dict (the real COCO file needs network access; shapes/keys are what matter).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereotracking_tpu.models.detector import DetectorConfig, YOLOXDetector
from stereotracking_tpu.utils.torch_convert import (convert_yolox_state_dict,
                                                    merge_into)


def fabricate_torch_sd(params, stats, prefix=''):
    """Reverse-map our flax tree into torch-style keys to fabricate a
    checkpoint with correct shapes."""
    sd = {}

    def conv_module(tree, st, tprefix):
        k = np.asarray(tree['conv']['kernel'])
        sd[f'{tprefix}.conv.weight'] = np.transpose(k, (3, 2, 0, 1))
        if 'bn' in tree:
            sd[f'{tprefix}.bn.weight'] = np.asarray(tree['bn']['scale'])
            sd[f'{tprefix}.bn.bias'] = np.asarray(tree['bn']['bias'])
            sd[f'{tprefix}.bn.running_mean'] = np.asarray(st['bn']['mean'])
            sd[f'{tprefix}.bn.running_var'] = np.asarray(st['bn']['var'])

    def csp(tree, st, tprefix):
        for name in ('main_conv', 'short_conv', 'final_conv'):
            conv_module(tree[name], st[name], f'{tprefix}.{name}')
        i = 0
        while f'blocks_{i}' in tree:
            for c in ('conv1', 'conv2'):
                conv_module(tree[f'blocks_{i}'][c], st[f'blocks_{i}'][c],
                            f'{tprefix}.blocks.{i}.{c}')
            i += 1

    bb, sb = params['backbone'], stats['backbone']
    conv_module(bb['stem']['conv'], sb['stem']['conv'], 'backbone.stem.conv')
    for i in range(1, 5):
        stg, sst = bb[f'stage{i}'], sb[f'stage{i}']
        conv_module(stg['conv'], sst['conv'], f'backbone.stage{i}.0')
        if 'spp' in stg:
            for c in ('conv1', 'conv2'):
                conv_module(stg['spp'][c], sst['spp'][c],
                            f'backbone.stage{i}.1.{c}')
            csp(stg['csp'], sst['csp'], f'backbone.stage{i}.2')
        else:
            csp(stg['csp'], sst['csp'], f'backbone.stage{i}.1')
    nk, sn = params['neck'], stats['neck']
    for k in range(2):
        conv_module(nk[f'reduce_{k}'], sn[f'reduce_{k}'],
                    f'neck.reduce_layers.{k}')
        csp(nk[f'top_down_{k}'], sn[f'top_down_{k}'],
            f'neck.top_down_blocks.{k}')
        conv_module(nk[f'downsample_{k}'], sn[f'downsample_{k}'],
                    f'neck.downsamples.{k}')
        csp(nk[f'bottom_up_{k}'], sn[f'bottom_up_{k}'],
            f'neck.bottom_up_blocks.{k}')
    for k in range(3):
        conv_module(nk[f'out_{k}'], sn[f'out_{k}'], f'neck.out_convs.{k}')
    hd, sh = params['bbox_head'], stats['bbox_head']
    for lvl in range(3):
        for i in range(2):
            conv_module(hd[f'cls_convs_{lvl}_{i}'], sh[f'cls_convs_{lvl}_{i}'],
                        f'bbox_head.head_module.multi_level_cls_convs.{lvl}.{i}')
            conv_module(hd[f'reg_convs_{lvl}_{i}'], sh[f'reg_convs_{lvl}_{i}'],
                        f'bbox_head.head_module.multi_level_reg_convs.{lvl}.{i}')
        for ours, theirs in (('conv_cls', 'multi_level_conv_cls'),
                             ('conv_reg', 'multi_level_conv_reg'),
                             ('conv_obj', 'multi_level_conv_obj')):
            t = hd[f'{ours}_{lvl}']
            sd[f'bbox_head.head_module.{theirs}.{lvl}.weight'] = \
                np.transpose(np.asarray(t['kernel']), (3, 2, 0, 1))
            sd[f'bbox_head.head_module.{theirs}.{lvl}.bias'] = \
                np.asarray(t['bias'])
    return sd


@pytest.fixture(scope='module')
def single_branch_vars():
    module = YOLOXDetector(DetectorConfig(backbone='single', num_classes=80))
    v = module.init(jax.random.PRNGKey(0),
                    {'img': jnp.zeros((1, 64, 64, 3))}, train=False)
    return jax.tree.map(np.asarray, v)


def test_roundtrip_conversion_single_to_dual(single_branch_vars):
    """A fabricated 80-class single-branch 'COCO' ckpt loads into the
    1-class dual-branch model: backbone/neck identical, disparity branch
    duplicated from RGB, class conv skipped by shape."""
    sd = fabricate_torch_sd(single_branch_vars['params'],
                            single_branch_vars['batch_stats'])
    # make weights distinguishable from fresh init
    sd = {k: v + 0.5 if v.ndim == 4 else v for k, v in sd.items()}
    p_conv, s_conv = convert_yolox_state_dict(sd, dual_branch=True)

    dual = YOLOXDetector(DetectorConfig(backbone='dual', num_classes=1))
    dummy = {'img': jnp.zeros((1, 64, 64, 3)),
             'disp_postp': jnp.zeros((1, 64, 64, 3)),
             'disp_mask': jnp.zeros((1, 64, 64, 1))}
    variables = jax.tree.map(np.asarray, dual.init(
        jax.random.PRNGKey(1), dummy, train=False))
    params = variables['params']
    skipped = merge_into(params, p_conv)
    merge_into(variables['batch_stats'], s_conv)

    # stem weights transferred and duplicated into the disparity branch
    got = params['backbone']['stem']['conv']['conv']['kernel']
    exp = single_branch_vars['params']['backbone']['stem']['conv']['conv'][
        'kernel'] + 0.5
    np.testing.assert_allclose(got, exp, rtol=1e-6)
    np.testing.assert_allclose(
        params['backbone']['disp_stem']['conv']['conv']['kernel'], exp,
        rtol=1e-6)
    np.testing.assert_allclose(
        params['backbone']['disp_stage1']['conv']['conv']['kernel'],
        params['backbone']['stage1']['conv']['conv']['kernel'], rtol=1e-6)

    # 80-class cls conv skipped by shape mismatch; obj conv transferred
    assert any('conv_cls' in s for s in skipped)
    np.testing.assert_allclose(
        params['bbox_head']['conv_obj_0']['kernel'],
        single_branch_vars['params']['bbox_head']['conv_obj_0']['kernel']
        + 0.5, rtol=1e-6)

    # model still runs with merged weights
    out = dual.apply({'params': params,
                      'batch_stats': variables['batch_stats']},
                     dummy, train=False)
    assert len(out[0]) == 3
