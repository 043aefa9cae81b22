"""Data pipeline tests: dataset parsing, transforms, samplers, round trips."""
import numpy as np
import pytest

from stereotracking_tpu.data import (CocoDispDataset, MOTDispDataset,
                                     PrefetchIterator, VideoSampler,
                                     transforms as T)
from synthetic_dataset import write_airdrone_dataset


@pytest.fixture(scope='module')
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('airdrone')
    ann = write_airdrone_dataset(str(root))
    return str(root), ann


def test_disparity_png_roundtrip(dataset_root):
    root, ann = dataset_root
    ds = MOTDispDataset(ann, data_root=root, depth_dir_name='depth')
    frame = ds.load_frame(ds.video_frames(ds.videos()[0])[0])
    assert frame['disp_raw'].dtype == np.uint16
    # sky = 65535 -> postp 0, mask 0
    assert frame['disp_postp'][0, 0] == 0.0
    assert frame['disp_mask'][0, 0] == 0.0
    # ground plane has valid disparity
    h = frame['img'].shape[0]
    assert frame['disp_mask'][h - 1, 0] == 1.0
    assert frame['disp_postp'][h - 1, 0] > 0
    # depth loaded in meters (20000 cm = 200 m)
    assert abs(frame['depth_postp'][0, 0] - 200.0) < 1e-3


def test_annotations_and_locations(dataset_root):
    root, ann = dataset_root
    ds = MOTDispDataset(ann, data_root=root)
    info = ds.frame_info(ds.video_frames(ds.videos()[0])[0])
    assert info['gt_bboxes'].shape[1] == 4
    assert len(info['gt_instance_ids']) == len(info['gt_bboxes'])
    assert info['gt_locations'].shape[1] == 3
    assert (info['gt_locations'][:, 2] > 0).all()


def test_path_derivation():
    from stereotracking_tpu.data.datasets import derive_modal_path
    p = derive_modal_path('/d/airsim/seq/left/0_left.png',
                          'airsim/seq/left/0_left.png', 'disparity')
    assert p == '/d/airsim/seq/disparity/0_disparity.png'
    p = derive_modal_path('/d/kitti/img2/0.png', 'kitti/img2/0.png',
                          'disparity')
    assert p == '/d/kitti/disparity/0.png'


def test_explicit_path_token():
    from stereotracking_tpu.data.datasets import derive_modal_path
    # no substring heuristic needed when the caller states the style
    p = derive_modal_path('/d/seqA/img2/0.png', 'seqA/img2/0.png',
                          'disparity', token='img2')
    assert p == '/d/seqA/disparity/0.png'


def test_kitti_dataset_uses_img2_token(dataset_root, tmp_path):
    from stereotracking_tpu.data import MOTKittiDataset
    root, ann = dataset_root
    ds = MOTKittiDataset(ann, data_root=root)
    assert ds.path_token == 'img2'


def test_selma_24bit_depth_decode(tmp_path):
    """Golden test of loading_disparity.py:215-219 semantics: cv2-BGR
    dot([65535, 256, 1]) / (2^24-1), then inverse."""
    from PIL import Image
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (4, 6, 3), np.uint8)
    p = tmp_path / 'selma_depth.png'
    Image.fromarray(rgb).save(p)

    got = T.load_depth(str(p), mode='selma')
    r, g, b = [rgb[..., i].astype(np.float64) for i in range(3)]
    norm = (b * 65535.0 + g * 256.0 + r * 1.0) / (256 ** 3 - 1)
    expect = 1.0 / (norm + 1e-6)
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # SELMADataset selects the decode
    from stereotracking_tpu.data.domain_adaptation import SELMADataset
    assert SELMADataset.__init__.__kwdefaults__['depth_mode'] == 'selma'


def test_video_sampler_order_and_split(dataset_root):
    root, ann = dataset_root
    ds = MOTDispDataset(ann, data_root=root)
    all_frames = list(VideoSampler(ds))
    assert len(all_frames) == 10
    # two ranks: disjoint contiguous video split
    r0 = list(VideoSampler(ds, rank=0, world_size=2))
    r1 = list(VideoSampler(ds, rank=1, world_size=2))
    assert len(r0) == 5 and len(r1) == 5
    assert set(r0) | set(r1) == set(all_frames)
    assert set(r0).isdisjoint(r1)
    with pytest.raises(ValueError):
        VideoSampler(ds, rank=0, world_size=5)


def test_resize_pad_flip_consistency(dataset_root):
    root, ann = dataset_root
    ds = CocoDispDataset(ann, data_root=root)
    s = ds.load_sample(0)
    n_gt = len(s['gt_bboxes'])
    out = T.resize_keep_ratio(s, scale=(60, 80))
    assert out['img'].shape[:2] == (60, 80)
    assert out['disp_postp'].shape == (60, 80)
    # nearest-resized disparity contains only original values
    orig_vals = np.unique(s['disp_postp'])
    assert np.isin(np.unique(out['disp_postp']), orig_vals).all()
    out = T.pad_to_divisor(out, 32)
    assert out['img'].shape[:2] == (64, 96)
    assert out['img'][63, 95, 0] == 114  # pad value
    assert out['disp_postp'][63, 95] == 0

    rng = np.random.RandomState(0)
    flipped = T.random_flip(out, rng, prob=1.0)
    w = out['img'].shape[1]
    if n_gt:
        np.testing.assert_allclose(
            flipped['gt_bboxes'][:, 0], w - out['gt_bboxes'][:, 2])
    np.testing.assert_array_equal(flipped['img'][:, ::-1], out['img'])
    np.testing.assert_array_equal(flipped['disp_postp'][:, ::-1],
                                  out['disp_postp'])


def test_mixup_blends_and_keeps_alignment(dataset_root):
    root, ann = dataset_root
    ds = CocoDispDataset(ann, data_root=root)
    a, b = ds.load_sample(0), ds.load_sample(7)
    rng = np.random.RandomState(1)
    out = T.yolox_mixup(a, b, rng, img_scale=a['img'].shape[:2],
                        ratio_range=(1.0, 1.0), flip_ratio=1.1)  # no flip
    assert out['img'].shape == a['img'].shape
    assert len(out['gt_bboxes']) == len(a['gt_bboxes']) + len(b['gt_bboxes'])
    # mask is OR: at least as many valid pixels as either input
    assert out['disp_mask'].sum() >= a['disp_mask'].sum()


def test_hsv_aug_changes_pixels_keeps_range():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    out = T.hsv_random_aug(img, np.random.RandomState(3))
    assert out.dtype == np.uint8
    assert out.shape == img.shape
    assert not np.array_equal(out, img)


def test_prefetch_iterator_preserves_order():
    items = list(range(20))
    out = list(PrefetchIterator(items, lambda x: x * x, num_workers=4))
    assert out == [x * x for x in items]
