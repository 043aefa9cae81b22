"""End-to-end torch checkpoint loading through the init_* APIs.

The reference loads published torch checkpoints via ``init_model`` ->
``load_checkpoint`` (/root/reference/mmtrack/apis/inference.py:22-97); here
a saved ``.pth`` must flow through ``convert_zoo_checkpoint`` and land,
bit-exact, in the built model's variables.  (Forward-output parity of the
converted weights is certified separately in test_torch_parity_zoo.py.)
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np
import torch

import jax  # noqa: E402

from stereotracking_tpu.utils import torch_convert as TC  # noqa: E402

from test_torch_parity_zoo import (  # noqa: E402
    TFlowNetS, TRPNHead, TBBoxHead, TResNet50, TSiamRPN, _randomize)


def _leaves_equal(tree, expect, path=''):
    mismatches = []
    for k, v in expect.items():
        sub = tree[k]
        if isinstance(v, dict):
            mismatches += _leaves_equal(sub, v, f'{path}/{k}')
        elif not np.array_equal(np.asarray(sub), np.asarray(v)):
            mismatches.append(f'{path}/{k}')
    return mismatches


def test_init_sot_model_loads_torch_pth(tmp_path):
    from stereotracking_tpu.apis.inference import init_sot_model

    tm = _randomize(TSiamRPN(neck_out=256), seed=71)
    path = str(tmp_path / 'siamrpn.pth')
    torch.save({'state_dict': tm.state_dict(), 'meta': {}}, path)

    model = init_sot_model('siamrpn', checkpoint=path)
    expect = TC.convert_zoo_checkpoint(path, 'siamrpn')
    bad = _leaves_equal(model.variables, expect)
    assert not bad, bad[:10]


def test_init_vid_model_loads_torch_pth(tmp_path):
    from stereotracking_tpu.apis.inference import init_vid_model

    class TDFF(torch.nn.Module):
        def __init__(self):
            super().__init__()
            det = torch.nn.Module()
            det.backbone = TResNet50((1, 2, 2, 1), (1, 1, 1, 2))
            det.rpn_head = TRPNHead(2048, 512, 12)
            roi_head = torch.nn.Module()
            roi_head.bbox_head = TBBoxHead(2048, 7, 1024, 30)
            det.roi_head = roi_head
            self.detector = det
            self.motion = TFlowNetS()

    tm = _randomize(TDFF(), seed=72)
    path = str(tmp_path / 'dff.pth')
    torch.save({'state_dict': tm.state_dict(), 'meta': {}}, path)

    model = init_vid_model('dff', checkpoint=path, img_hw=(64, 64))
    expect = TC.convert_zoo_checkpoint(path, 'dff')
    bad = _leaves_equal(model.variables['detector'], expect['detector'])
    bad += _leaves_equal(model.variables['flownet'], expect['flownet'])
    assert not bad, bad[:10]


def test_init_sot_model_rejects_wrong_checkpoint(tmp_path):
    import pytest

    from stereotracking_tpu.apis.inference import init_sot_model

    # a SiamRPN checkpoint fed to the Stark loader must fail loudly, not
    # silently run random weights
    tm = _randomize(TSiamRPN(), seed=73)
    path = str(tmp_path / 'siamrpn.pth')
    torch.save({'state_dict': tm.state_dict(), 'meta': {}}, path)
    with pytest.raises((ValueError, KeyError)):
        init_sot_model('stark', checkpoint=path)
