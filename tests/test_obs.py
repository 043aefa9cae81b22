"""Observability backends (reference LoggerHook + vis_backends analog,
configs/_base_/default_runtime.py:4,18-20)."""
import json
import os

from stereotracking_tpu.utils.obs import MetricsLogger, build_logger


def test_jsonl_backend_and_interval(tmp_path):
    lg = MetricsLogger(str(tmp_path), backends=('jsonl',), interval=10)
    for step in range(25):
        lg.log_every(step, dict(loss=1.0 / (step + 1)), prefix='train')
    lg.log(99, dict(mAP=0.5), prefix='val')
    lg.close()
    lines = [json.loads(ln) for ln in
             open(tmp_path / 'scalars.jsonl').read().splitlines()]
    steps = [ln['step'] for ln in lines if ln['prefix'] == 'train']
    assert steps == [0, 10, 20]       # interval gating
    val = [ln for ln in lines if ln['prefix'] == 'val']
    assert val and val[0]['mAP'] == 0.5 and val[0]['step'] == 99


def test_tensorboard_backend_writes_events(tmp_path):
    lg = MetricsLogger(str(tmp_path),
                       backends=[dict(type='TensorboardVisBackend')],
                       interval=1)
    lg.log(0, dict(loss=2.0))
    lg.log(1, dict(loss=1.0))
    lg.close()
    tb_files = os.listdir(tmp_path / 'tb')
    assert any('tfevents' in f for f in tb_files), tb_files


def test_nonzero_rank_is_noop(tmp_path):
    lg = MetricsLogger(str(tmp_path), backends=('jsonl',), rank=1)
    lg.log(0, dict(loss=1.0))
    lg.close()
    assert not os.path.exists(tmp_path / 'scalars.jsonl')


def test_build_logger_from_config(tmp_path):
    cfg = dict(vis_backends=[dict(type='LocalVisBackend'),
                             dict(type='print')], log_interval=5)
    lg = build_logger(cfg, str(tmp_path))
    assert lg.interval == 5
    lg.log(3, dict(x=1.0))
    lg.close()
    assert os.path.exists(tmp_path / 'scalars.jsonl')
