"""TAO / DanceTrack reader tests + eval-CLI wiring.

Synthetic fixtures in each raw format (TAO CocoVID json with federated
meta; DanceTrack MOT-challenge directory layout) feed the readers and the
eval CLIs, per the reference dataset semantics
(/root/reference/mmtrack/datasets/tao_dataset.py,
dancetrack_dataset.py)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = f'{REPO}:{env.get("PYTHONPATH", "")}'
    return env


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def tao_root(tmp_path_factory):
    import PIL.Image
    root = tmp_path_factory.mktemp('tao')
    (root / 'v1').mkdir()
    H, W = 48, 64
    images, annotations = [], []
    aid = 1
    for f in range(3):
        img = (np.random.RandomState(f).rand(H, W, 3) * 255).astype(np.uint8)
        x = 8 + 4 * f
        img[12:28, x:x + 12] = [250, 30, 30]
        PIL.Image.fromarray(img).save(root / 'v1' / f'{f}.jpg')
        images.append(dict(
            id=100 + f, video_id=1, frame_id=f, frame_index=f,
            width=W, height=H, file_name=f'v1/{f}.jpg',
            neg_category_ids=[2], not_exhaustive_category_ids=[1]))
        annotations.append(dict(
            id=aid, image_id=100 + f, video_id=1, instance_id=7,
            category_id=1, bbox=[x, 12, 12, 16], area=192, iscrowd=0))
        aid += 1
    # a 2014-style named image in a second video
    (root / 'val2014').mkdir()
    PIL.Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
        root / 'val2014' / '000000000042.jpg')
    images.append(dict(
        id=200, video_id=2, frame_id=0, width=W, height=H,
        file_name='val2014/COCO_val2014_000000000042.jpg',
        neg_category_ids=[1], not_exhaustive_category_ids=[]))
    ann = dict(
        videos=[dict(id=1, name='v1', neg_category_ids=[2],
                     not_exhaustive_category_ids=[1]),
                dict(id=2, name='v2', neg_category_ids=[1],
                     not_exhaustive_category_ids=[])],
        images=images,
        categories=[dict(id=1, name='car'), dict(id=2, name='dog')],
        annotations=annotations)
    (root / 'ann.json').write_text(json.dumps(ann))
    return root


@pytest.fixture(scope='module')
def dancetrack_root(tmp_path_factory):
    import PIL.Image
    root = tmp_path_factory.mktemp('dancetrack')
    H, W = 96, 128
    for seq in ('dancetrack0001', 'dancetrack0002'):
        d = root / 'val' / seq
        (d / 'img1').mkdir(parents=True)
        (d / 'gt').mkdir()
        rows = []
        for f in range(1, 5):
            img = (np.random.RandomState(f).rand(H, W, 3) * 255
                   ).astype(np.uint8)
            x = 10 + 3 * f
            img[20:52, x:x + 20] = [40, 220, 40]
            PIL.Image.fromarray(img).save(d / 'img1' / f'{f:08d}.jpg')
            rows.append(f'{f},5,{x},20,20,32,1,1,1.0')
            if f >= 2:
                rows.append(f'{f},9,{60},40,16,24,1,1,0.6')
        (d / 'gt' / 'gt.txt').write_text('\n'.join(rows) + '\n')
        (d / 'seqinfo.ini').write_text(
            f'[Sequence]\nname={seq}\nimDir=img1\nframeRate=20\n'
            f'seqLength=4\nimWidth={W}\nimHeight={H}\nimExt=.jpg\n')
    return root


# ---------------------------------------------------------------------------
# reader units
# ---------------------------------------------------------------------------

def test_tao_reader_and_federated_meta(tao_root):
    from stereotracking_tpu.data import TAODataset
    from stereotracking_tpu.evaluation.track_ap import TAOMetric
    ds = TAODataset(str(tao_root / 'ann.json'), data_root=str(tao_root))
    assert ds.videos() == [1, 2]
    assert len(ds.video_frames(1)) == 3

    info = ds.frame_info(ds.video_frames(1)[0])
    assert info['gt_bboxes'].shape == (1, 4)
    np.testing.assert_allclose(info['gt_bboxes'][0], [8, 12, 20, 28])
    assert info['gt_instance_ids'][0] == 7

    # COCO-2014 name fix (tao_dataset.py:58-64)
    info2 = ds.frame_info(200)
    assert info2['img_path'].endswith('val2014/000000000042.jpg')
    assert os.path.exists(info2['img_path'])

    meta = ds.video_meta(1)
    assert meta['neg_category_ids'] == [2]
    assert meta['not_exhaustive_category_ids'] == [1]

    metric = TAOMetric()
    ds.register_federated_meta(metric)
    # category ids map to contiguous labels (car=0, dog=1)
    assert metric._neg_cats['v1'] == {1}
    assert metric._not_exhaustive_cats['v1'] == {0}
    assert metric._neg_cats['v2'] == {0}

    tracks = ds.gt_tracks(1)
    assert set(tracks) == {7}
    assert tracks[7]['label'] == 0
    assert len(tracks[7]['track']) == 3

    # loading gives pixels
    s = ds.load_frame(ds.video_frames(1)[1])
    assert s['img'].shape == (48, 64, 3)


def test_tao_gt_tracks_feed_metric_perfectly(tao_root):
    """Feeding the gt back as predictions scores AP == 1 under federated
    evaluation."""
    from stereotracking_tpu.data import TAODataset
    from stereotracking_tpu.evaluation.track_ap import TAOMetric
    ds = TAODataset(str(tao_root / 'ann.json'), data_root=str(tao_root))
    metric = TAOMetric()
    ds.register_federated_meta(metric)
    for vid in ds.videos():
        vname = ds.video_name(vid)
        for inst, rec in ds.gt_tracks(vid).items():
            metric.add_gt_track(vname, rec['label'], rec['track'])
            metric.add_pred_track(vname, rec['label'], 0.9, rec['track'])
    out = metric.evaluate()
    assert abs(out['track_mAP'] - 1.0) < 1e-6


def test_dancetrack_reader(dancetrack_root):
    from stereotracking_tpu.data import DanceTrackDataset
    ds = DanceTrackDataset(str(dancetrack_root), split='val')
    assert ds.videos() == ['dancetrack0001', 'dancetrack0002']
    frames = ds.video_frames('dancetrack0001')
    assert len(frames) == 4

    info = ds.frame_info(frames[0])
    assert (info['width'], info['height']) == (128, 96)
    assert info['gt_bboxes'].shape == (1, 4)
    np.testing.assert_allclose(info['gt_bboxes'][0], [13, 20, 33, 52])
    assert info['gt_instance_ids'][0] == 5

    info3 = ds.frame_info(frames[2])
    assert len(info3['gt_instance_ids']) == 2
    assert 0.6 in info3['gt_visibility']

    s = ds.load_frame(frames[1])
    assert s['img'].shape == (96, 128, 3)
    assert s['disp_mask'].max() == 0.0        # monocular: no valid disparity
    assert s['disp_postp'].shape == (96, 128)

    # visibility threshold filter
    ds2 = DanceTrackDataset(str(dancetrack_root), split='val',
                            visibility_thr=0.8)
    i2 = ds2.frame_info(ds2.video_frames('dancetrack0001')[2])
    assert len(i2['gt_instance_ids']) == 1


# ---------------------------------------------------------------------------
# eval-CLI wiring
# ---------------------------------------------------------------------------

def test_tools_test_runs_on_dancetrack(dancetrack_root, tmp_path):
    """tools/test.py consumes a DanceTrackDataset test_dataloader config
    (tiny detector; monocular zero-disparity path)."""
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(f"""
_base_ = ['{REPO}/configs/stereo_tracking/ocsort/yolox_s_airdrone_disp.py']
img_scale = (96, 128)
test_dataloader = dict(dataset=dict(type='DanceTrackDataset',
                                    data_root='{dancetrack_root}/',
                                    split='val'))
model = dict(detector=dict(backbone=dict(deepen_factor=0.1,
                                         widen_factor=0.125)))
""")
    out = tmp_path / 'work'
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test.py'), str(cfg),
         '--work-dir', str(out)],
        env=_env(), capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads((out / 'metrics.json').read_text())
    for k in ('MOTA', 'IDF1', 'HOTA', 'fps'):
        assert k in metrics, metrics


@pytest.mark.skipif(os.environ.get('STTPU_SLOW_TESTS') != '1',
                    reason='QDTrack ResNet-50+FPN compile is heavy on CPU')
def test_tools_test_tao_cli(tao_root, tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / 'tools' / 'test_tao.py'),
         '--ann-file', str(tao_root / 'ann.json'),
         '--data-root', str(tao_root),
         '--img-hw', '64', '96', '--num-classes', '2',
         '--out', str(tmp_path / 'metrics.json')],
        env=_env(), capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    metrics = json.loads((tmp_path / 'metrics.json').read_text())
    assert 'track_mAP' in metrics
