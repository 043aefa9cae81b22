"""SOT data layer: SiamFC crop math, Stark crops, bbox jitter, frame
sampling, and the GOT10k/LaSOT dataset readers on a synthetic on-disk
layout (reference: mmtrack/datasets/transforms/{transforms,processing}.py,
mmtrack/datasets/got10k_dataset.py)."""
import os

import numpy as np
import pytest

from stereotracking_tpu.data.sot import (
    Got10kDataset, LaSOTDataset, SOTVideoDataset, blur_aug, brightness_aug,
    crop_like_siamfc, crop_like_stark, dimp_sampling, gray_aug,
    pair_sampling, seq_bbox_jitter, siamfc_generated_box, trident_sampling)


def test_siamfc_crop_shape_and_generated_box():
    img = (np.random.RandomState(0).rand(120, 160, 3) * 255)
    bbox = np.array([60., 40., 100., 80.])
    crop = crop_like_siamfc(img, bbox, crop_size=255)
    assert crop.shape == (255, 255, 3)
    gen = siamfc_generated_box((255, 255), bbox)
    # centered square-ish box: center at crop center
    assert abs((gen[0] + gen[2]) / 2 - 127) < 1
    assert abs((gen[1] + gen[3]) / 2 - 127) < 1
    # exemplar-size scaling: a square bbox of side s maps to
    # s * 127/(s*(1+2*ctx... )) -- just check sane bounds
    assert 0 < gen[2] - gen[0] < 127


def test_stark_crop_mask_and_bbox_transform():
    img = np.full((100, 120, 3), 200.0)
    gt = np.array([40., 30., 80., 70.])
    crop, mask, out_bbox = crop_like_stark(img, gt, gt, 2.0, 64)
    assert crop.shape == (64, 64, 3) and mask.shape == (64, 64)
    # interior crop -> no padding
    assert mask.max() == 0.0
    # gt box maps to the center with size scaled by 64/80
    cx = (out_bbox[0] + out_bbox[2]) / 2
    assert abs(cx - 32) < 1.5
    assert abs((out_bbox[2] - out_bbox[0]) - 40 * 64 / 80) < 1.5
    # corner crop produces padding
    gt2 = np.array([0., 0., 20., 20.])
    _, mask2, _ = crop_like_stark(img, gt2, gt2, 2.0, 64)
    assert mask2.max() > 0


def test_seq_bbox_jitter_reproducible_and_valid():
    rng = np.random.RandomState(0)
    out = seq_bbox_jitter([np.array([10., 10., 50., 50.])] * 2,
                          [0.25, 0.25], [3.0, 3.0], [2.0, 2.0], rng)
    assert len(out) == 2
    for b in out:
        assert b[2] > b[0] and b[3] > b[1]


def _vinfo(n, vid=0):
    return dict(video_id=vid, video_length=n,
                img_paths=[f'{i}.jpg' for i in range(n)],
                frame_ids=list(range(n)),
                bboxes=np.tile([0, 0, 10, 10], (n, 1)).astype(np.float32),
                bboxes_isvalid=np.ones(n, bool),
                visible=np.ones(n, bool))


def test_pair_sampling_positive_and_negative():
    rng = np.random.RandomState(1)
    v1, v2 = _vinfo(30, 0), _vinfo(30, 1)
    pos = pair_sampling(v1, v2, frame_range=5, pos_prob=1.0, rng=rng)
    assert pos['is_positive']
    t_idx = pos['template'][1]
    s_idx = pos['search'][1]
    assert abs(s_idx - t_idx) <= 5
    neg = pair_sampling(v1, v2, frame_range=5, pos_prob=0.0, rng=rng)
    assert not neg['is_positive']
    assert neg['search'][0]['video_id'] == 1


def test_trident_and_dimp_sampling():
    rng = np.random.RandomState(2)
    v = _vinfo(50)
    tr = trident_sampling(v, rng=rng)
    assert tr is not None and len(tr['template_inds']) == 2
    dm = dimp_sampling(v, rng=rng)
    assert dm is not None
    assert max(dm['template_inds']) <= min(dm['search_inds'])
    # all-invisible video -> None
    v['visible'][:] = False
    assert trident_sampling(v, rng=rng) is None


def test_augs_shapes():
    rng = np.random.RandomState(3)
    img = rng.rand(20, 20, 3) * 255
    assert brightness_aug(img, rng=rng).shape == img.shape
    g = gray_aug(img, prob=1.0, rng=rng)
    assert np.allclose(g[..., 0], g[..., 1])
    assert blur_aug(img, prob=1.0, rng=rng).shape == img.shape


@pytest.fixture
def got10k_disk(tmp_path):
    import PIL.Image
    for vid in ['video_a', 'video_b']:
        d = tmp_path / vid
        d.mkdir()
        boxes = []
        for i in range(5):
            PIL.Image.fromarray(
                np.zeros((40, 60, 3), np.uint8)).save(d / f'{i:08d}.jpg')
            boxes.append([5 + i, 6, 20, 18])
        np.savetxt(d / 'groundtruth.txt', np.asarray(boxes), fmt='%d',
                   delimiter=',')
        np.savetxt(d / 'absence.label', [0, 0, 1, 0, 0], fmt='%d')
        np.savetxt(d / 'cover.label', [8, 8, 8, 0, 8], fmt='%d')
    return tmp_path


def test_got10k_reader(got10k_disk):
    ds = Got10kDataset(str(got10k_disk))
    assert len(ds) == 2
    info = ds.video_info(0)
    assert info['video_length'] == 5
    assert info['bboxes'].shape == (5, 4)
    # frame 2 absent, frame 3 fully covered -> invisible
    np.testing.assert_array_equal(info['visible'],
                                  [True, True, False, False, True])
    # xywh -> xyxy
    np.testing.assert_allclose(info['bboxes'][0], [5, 6, 25, 24])


def test_lasot_reader(tmp_path):
    import PIL.Image
    d = tmp_path / 'v'
    (d / 'img').mkdir(parents=True)
    for i in range(3):
        PIL.Image.fromarray(
            np.zeros((30, 30, 3), np.uint8)).save(
                d / 'img' / f'{i + 1:08d}.jpg')
    np.savetxt(d / 'groundtruth.txt', [[1, 1, 5, 5]] * 3, fmt='%d',
               delimiter=',')
    np.savetxt(d / 'full_occlusion.txt', [[0, 1, 0]], fmt='%d',
               delimiter=',')
    ds = LaSOTDataset(str(tmp_path))
    info = ds.video_info(0)
    np.testing.assert_array_equal(info['visible'], [True, False, True])


def test_otb_reader_with_init_omit(tmp_path):
    import PIL.Image
    d = tmp_path / 'Biker'
    d.mkdir()
    for i in range(4):
        PIL.Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
            d / f'{i:04d}.jpg')
    (d / 'groundtruth_rect.txt').write_text(
        '1,2,5,5\n2\t3\t5\t5\n3,4,5,5\n4,5,5,5\n')
    from stereotracking_tpu.data.sot import OTB100Dataset
    ds = OTB100Dataset(str(tmp_path), init_omit={'Biker': 1})
    info = ds.video_info(0)
    assert info['video_length'] == 3
    np.testing.assert_allclose(info['bboxes'][0], [2, 3, 7, 8])


def test_vot_reader_polygon_hull(tmp_path):
    import PIL.Image
    d = tmp_path / 'seq'
    d.mkdir()
    for i in range(2):
        PIL.Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
            d / f'{i:08d}.jpg')
    (d / 'groundtruth.txt').write_text(
        '1,1,9,1,9,5,1,5\n2,2,8,2,8,6,2,6\n')
    from stereotracking_tpu.data.sot import VOTDataset
    ds = VOTDataset(str(tmp_path))
    info = ds.video_info(0)
    np.testing.assert_allclose(info['bboxes'][0], [1, 1, 9, 5])
    assert info['polygons'].shape == (2, 8)


def test_siamrpn_unfreeze_prefixes():
    from stereotracking_tpu.data.sot import siamrpn_unfreeze_prefixes
    assert 'layer4_' in siamrpn_unfreeze_prefixes(0)
    assert siamrpn_unfreeze_prefixes(10) == ('conv1', 'layer1_')


def test_random_sample_concat():
    from stereotracking_tpu.data.sot import RandomSampleConcatDataset

    class Toy:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return self.tag

    rng = np.random.RandomState(0)
    ds = RandomSampleConcatDataset([Toy('a', 5), Toy('b', 5)],
                                   weights=[1.0, 0.0], rng=rng)
    assert len(ds) == 10
    assert all(ds[i] == 'a' for i in range(20))


def test_check_pad_mask_validity():
    from stereotracking_tpu.data.sot import check_pad_mask_validity
    good = np.zeros((32, 32))
    assert check_pad_mask_validity([good], stride=16)
    bad = np.ones((32, 32))
    assert not check_pad_mask_validity([bad], stride=16)
    # padding everywhere except one full cell -> valid
    partial = np.ones((32, 32))
    partial[:16, :16] = 0
    assert check_pad_mask_validity([partial], stride=16)


def test_sot_coco_dataset(tmp_path):
    import json

    from stereotracking_tpu.data.sot import SOTCocoDataset
    ann = dict(
        images=[dict(id=1, file_name='a.jpg', width=64, height=48),
                dict(id=2, file_name='b.jpg', width=64, height=48)],
        annotations=[
            dict(id=10, image_id=1, bbox=[4, 6, 20, 10], iscrowd=0),
            dict(id=11, image_id=1, bbox=[0, 0, 5, 5], iscrowd=1),
            dict(id=12, image_id=2, bbox=[1, 2, 0, 8], iscrowd=0)],
        categories=[dict(id=1, name='x')])
    p = tmp_path / 'coco.json'
    p.write_text(json.dumps(ann))
    ds = SOTCocoDataset(str(p), img_prefix='/data')
    # crowd annotation excluded; each annotation is a length-1 video
    assert len(ds) == 2
    info = ds.video_info(0)
    assert info['video_length'] == 1
    assert info['img_paths'] == ['/data/a.jpg']
    np.testing.assert_allclose(info['bboxes'][0], [4, 6, 24, 16])
    assert info['visible'][0]
    # zero-width box -> invalid
    assert not ds.video_info(1)['bboxes_isvalid'][0]


def test_sot_imagenet_vid_dataset(tmp_path):
    import json

    from stereotracking_tpu.data.sot import SOTImageNetVIDDataset
    ann = dict(
        videos=[dict(id=1, name='v')],
        images=[dict(id=1, video_id=1, frame_id=0, file_name='f0.jpg'),
                dict(id=2, video_id=1, frame_id=2, file_name='f2.jpg'),
                dict(id=3, video_id=1, frame_id=5, file_name='f5.jpg')],
        annotations=[
            dict(id=1, image_id=1, instance_id=7, bbox=[4, 6, 20, 10]),
            dict(id=2, image_id=2, instance_id=7, bbox=[6, 8, 20, 10],
                 occluded=True),
            dict(id=3, image_id=3, instance_id=7, bbox=[8, 9, 20, 10]),
            dict(id=4, image_id=1, instance_id=9, bbox=[0, 0, 8, 8])],
        categories=[dict(id=1, name='x')])
    p = tmp_path / 'vid.json'
    p.write_text(json.dumps(ann))
    ds = SOTImageNetVIDDataset(str(p))
    assert len(ds) == 2                     # instances 7 and 9
    info = ds.video_info(0)                 # instance 7
    assert info['video_length'] == 3
    # frame ids are NOT contiguous (sot_imagenet_vid_dataset.py:81)
    assert info['frame_ids'] == [0, 2, 5]
    np.testing.assert_allclose(info['bboxes'][1], [6, 8, 26, 18])
    # occluded middle frame is not visible
    assert list(info['visible']) == [True, False, True]
