"""End-to-end VID/VIS evaluation CLI tests (tools/test_vid.py,
tools/test_vis.py) over a synthetic CocoVID/YTVIS-format dataset.
Gated: full detector/transformer compiles are heavy on CPU."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get('STTPU_SLOW_TESTS') != '1',
    reason='VID/VIS eval CLIs are compile-heavy')


@pytest.fixture(scope='module')
def vid_dataset(tmp_path_factory):
    import PIL.Image
    root = tmp_path_factory.mktemp('vidvis')
    (root / 'v').mkdir()
    H, W = 48, 64
    images, annotations = [], []
    for f in range(2):
        img = (np.random.RandomState(f).rand(H, W, 3) * 255
               ).astype(np.uint8)
        x, y = 10 + 2 * f, 12
        img[y:y + 16, x:x + 12] = [240, 40, 40]
        PIL.Image.fromarray(img).save(root / 'v' / f'{f}.jpg')
        images.append(dict(id=10 + f, video_id=1, frame_id=f, width=W,
                           height=H, file_name=f'v/{f}.jpg'))
        annotations.append(dict(
            id=f + 1, image_id=10 + f, video_id=1, instance_id=3,
            category_id=7, bbox=[x, y, 12, 16], area=192, iscrowd=0,
            segmentation=[[x, y, x + 12, y, x + 12, y + 16, x, y + 16]]))
    ann = dict(videos=[dict(id=1, name='v')], images=images,
               categories=[dict(id=7, name='person')],
               annotations=annotations)
    (root / 'ann.json').write_text(json.dumps(ann))
    return root


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = f'{REPO}:{env.get("PYTHONPATH", "")}'
    return env


def test_test_vid_cli(vid_dataset, tmp_path):
    out = tmp_path / 'metrics.json'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test_vid.py'),
         '--ann-file', str(vid_dataset / 'ann.json'),
         '--img-prefix', str(vid_dataset), '--method', 'dff',
         '--num-classes', '1', '--img-hw', '48', '64',
         '--out', str(out)],
        env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(out.read_text())
    assert 'mAP' in m and m['mAP'] >= 0.0


def test_test_vis_cli_masktrack(vid_dataset, tmp_path):
    out = tmp_path / 'metrics.json'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test_vis.py'),
         '--ann-file', str(vid_dataset / 'ann.json'),
         '--img-prefix', str(vid_dataset), '--model', 'masktrack',
         '--num-classes', '3', '--img-hw', '48', '64',
         '--num-proposals', '16', '--rpn-nms-pre', '64',
         '--rcnn-max-per-img', '8', '--out', str(out)],
        env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(out.read_text())
    assert 'track_mAP' in m
