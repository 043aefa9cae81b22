"""Multi-process (2-rank CPU) tests for the distributed eval/train wiring.

VERDICT r1 item 3: prove that rank-split evaluation + metric all-gather
produces exactly the single-process metrics, end-to-end through the real
CLIs, using the JAX distributed runtime over two local CPU processes.
"""
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from synthetic_dataset import write_airdrone_dataset

REPO = Path(__file__).parent.parent


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(extra=None):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # one CPU device per process: the mesh spans processes, not local devices
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    env['PYTHONPATH'] = f'{REPO}:{env.get("PYTHONPATH", "")}'
    env.update(extra or {})
    return env


@pytest.fixture(scope='module')
def disk_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('dist')
    write_airdrone_dataset(str(root), n_videos=2, n_frames=4, h=96, w=128)
    cfg = root / 'cfg.py'
    cfg.write_text(f"""
_base_ = ['{REPO}/configs/stereo_tracking/ocsort/yolox_s_airdrone_disp.py']
data_root = '{root}/'
img_scale = (96, 128)
train_dataloader = dict(batch_size=2,
                        dataset=dict(data_root='{root}/',
                                     ann_file='annotations.json',
                                     img_prefix=''))
val_dataloader = dict(dataset=dict(data_root='{root}/',
                                   ann_file='annotations.json',
                                   img_prefix='',
                                   depth_dir_name='depth'))
test_dataloader = val_dataloader
model = dict(detector=dict(backbone=dict(deepen_factor=0.1,
                                         widen_factor=0.125)))
""")
    return root, cfg


def _launch_ranks(cmd_for_rank, n=2, timeout=900):
    port = _free_port()
    procs = []
    for r in range(n):
        dist_args = ['--launcher', 'jax',
                     '--dist-coordinator', f'localhost:{port}',
                     '--dist-num-processes', str(n),
                     '--dist-process-id', str(r)]
        procs.append(subprocess.Popen(
            cmd_for_rank(r) + dist_args, env=_env(),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    deadline = time.time() + timeout
    for p in procs:
        remaining = max(1, deadline - time.time())
        out, err = p.communicate(timeout=remaining)
        outs.append((p.returncode, out, err))
    return outs


def test_two_process_eval_equals_single(disk_dataset, tmp_path):
    root, cfg = disk_dataset

    # single-process reference run
    single = tmp_path / 'single'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test.py'), str(cfg),
         '--work-dir', str(single)],
        env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    want = json.loads((single / 'metrics.json').read_text())

    # two-process rank-split run (rank 0 writes the gathered metrics)
    dist_dir = tmp_path / 'dist'
    outs = _launch_ranks(lambda rank: [
        sys.executable, str(REPO / 'tools' / 'test.py'), str(cfg),
        '--work-dir', str(dist_dir)])
    for rc, out, err in outs:
        assert rc == 0, err[-3000:]
    got = json.loads((dist_dir / 'metrics.json').read_text())

    for k, v in want.items():
        if k == 'fps':   # wall-clock, not a correctness field
            continue
        assert got[k] == pytest.approx(v, abs=1e-6), \
            f'{k}: dist {got[k]} vs single {v}'


def test_two_process_train_step(disk_dataset, tmp_path):
    """2-rank data-parallel training: each rank feeds half the global batch;
    one epoch completes and rank 0 exports the detector."""
    root, cfg = disk_dataset
    out = tmp_path / 'train2p'
    outs = _launch_ranks(lambda rank: [
        sys.executable, str(REPO / 'tools' / 'train.py'), str(cfg),
        '--work-dir', str(out), '--max-epochs', '1',
        '--steps-per-epoch', '2', '--batch-size', '2', '--max-gt', '8',
        '--img-scale', '96', '128'])
    for rc, o, err in outs:
        assert rc == 0, err[-3000:]
    assert (out / 'detector_final.ckpt').exists()
    assert 'loss' in outs[0][1]


def test_allgather_pyobj_roundtrip_single_process():
    from stereotracking_tpu.parallel.dist import allgather_pyobj
    obj = {'a': np.arange(3), 'b': 'x'}
    out = allgather_pyobj(obj)
    assert len(out) == 1 and out[0]['b'] == 'x'
