"""End-to-end SOT CLI tests: train_sot over a synthetic GOT10k-layout
dataset and demo_sot tracking a frame directory (reduced 63/127 crops —
same backbone algebra as the canonical sizes, cached compiles)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


@pytest.fixture(scope='module')
def sot_dataset(tmp_path_factory):
    import PIL.Image
    root = tmp_path_factory.mktemp('sotdata')
    rng = np.random.RandomState(0)
    for v in range(3):
        d = root / f'video_{v}'
        d.mkdir()
        boxes = []
        for i in range(8):
            img = rng.randint(0, 255, (120, 160, 3), np.uint8)
            x, y = 30 + i * 2, 25 + i
            img[y:y + 40, x:x + 50] = [250, 60, 60]
            PIL.Image.fromarray(img).save(d / f'{i:08d}.jpg')
            boxes.append([x, y, 50, 40])
        np.savetxt(d / 'groundtruth.txt', np.asarray(boxes), fmt='%d',
                   delimiter=',')
    return root


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = f'{REPO}:{env.get("PYTHONPATH", "")}'
    env.setdefault('JAX_COMPILATION_CACHE_DIR',
                   os.path.expanduser('~/.cache/stereotracking_jax'))
    return env


def test_train_sot_cli(sot_dataset, tmp_path):
    out = tmp_path / 'work'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'train_sot.py'),
         '--data-root', str(sot_dataset), '--dataset', 'generic',
         '--epochs', '1', '--steps-per-epoch', '2', '--batch-size', '2',
         '--exemplar-size', '63', '--search-size', '127',
         '--work-dir', str(out), '--ckpt-interval', '1'],
        env=_env(), capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / 'siamrpn_e1.ckpt').exists()
    assert 'total=' in r.stdout


def test_demo_sot_cli(sot_dataset, tmp_path):
    txt = tmp_path / 'track.txt'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'demo_sot.py'),
         str(sot_dataset / 'video_0'), '--init-bbox', '30', '25', '80',
         '65', '--tracker', 'siamrpn', '--out-txt', str(txt),
         '--cfg-options', 'exemplar_size=63', 'search_size=127'],
        env=_env(), capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    rows = txt.read_text().strip().splitlines()
    assert len(rows) == 8
    x, y, w, h = [float(v) for v in rows[0].split(',')]
    assert (x, y, w, h) == (30.0, 25.0, 50.0, 40.0)


def test_test_sot_ope_eval(sot_dataset, tmp_path):
    """tools/test_sot.py scores a random-weights SiamRPN with OPE and
    writes metrics.json + a GOT10k dump."""
    out = tmp_path / 'ope'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test_sot.py'),
         '--data-root', str(sot_dataset), '--dataset', 'generic',
         '--tracker', 'siamrpn', '--max-videos', '1', '--max-frames', '3',
         '--out-dir', str(out)],
        env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    import json
    m = json.loads((out / 'metrics.json').read_text())
    assert 'success' in m and 0.0 <= float(m['success']) <= 100.0

    dump = tmp_path / 'got'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test_sot.py'),
         '--data-root', str(sot_dataset), '--dataset', 'generic',
         '--tracker', 'siamrpn', '--max-videos', '1', '--max-frames', '2',
         '--dump', 'got10k', '--out-dir', str(dump)],
        env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    files = list(dump.glob('*/*_001.txt'))
    assert files and len(files[0].read_text().splitlines()) == 2


def test_train_sot_cli_sot_coco(tmp_path):
    """train_sot over the SOT-COCO wrapper (sot_coco_dataset.py analog):
    single-frame COCO instances feed the same crop-pair pipeline."""
    import json

    import PIL.Image
    root = tmp_path / 'coco'
    root.mkdir()
    rng = np.random.RandomState(1)
    images, annotations = [], []
    for i in range(4):
        img = rng.randint(0, 255, (120, 160, 3), np.uint8)
        x, y = 30 + 5 * i, 25 + 3 * i
        img[y:y + 40, x:x + 50] = [60, 250, 60]
        PIL.Image.fromarray(img).save(root / f'{i}.jpg')
        images.append(dict(id=i + 1, file_name=f'{i}.jpg',
                           width=160, height=120))
        annotations.append(dict(id=10 + i, image_id=i + 1, category_id=1,
                                bbox=[x, y, 50, 40], iscrowd=0, area=2000))
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name='x')])
    (root / 'ann.json').write_text(json.dumps(ann))

    out = tmp_path / 'work'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'train_sot.py'),
         '--data-root', str(root), '--dataset', 'sot_coco',
         '--ann-file', str(root / 'ann.json'),
         '--epochs', '1', '--steps-per-epoch', '2', '--batch-size', '2',
         '--exemplar-size', '63', '--search-size', '127',
         '--work-dir', str(out), '--ckpt-interval', '1'],
        env=_env(), capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / 'siamrpn_e1.ckpt').exists()
