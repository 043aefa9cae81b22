"""YouTube-VIS dataset reader: polygon rasterization, RLE decode,
frame_info surface (reference: mmtrack/datasets/youtube_vis_dataset.py)."""
import json

import numpy as np

from stereotracking_tpu.data.youtube_vis import (
    YouTubeVISDataset, decode_uncompressed_rle, rasterize_polygon)


def test_rasterize_rectangle_polygon():
    # axis-aligned rectangle covering pixels [2..5] x [1..3]
    poly = [[2, 1, 6, 1, 6, 4, 2, 4]]
    m = rasterize_polygon(poly, 6, 8)
    want = np.zeros((6, 8), bool)
    want[1:4, 2:6] = True
    np.testing.assert_array_equal(m, want)


def test_rasterize_triangle_area():
    poly = [[0, 0, 10, 0, 0, 10]]
    m = rasterize_polygon(poly, 10, 10)
    # half of the 10x10 square, within rasterization tolerance
    assert 35 <= m.sum() <= 55


def test_uncompressed_rle_column_major():
    # 2x3 mask: col-major counts [1, 1, 2, 2] -> F T | T F | F? build:
    rle = {'counts': [1, 2, 3]}
    m = decode_uncompressed_rle(rle, 2, 3)
    flat = m.T.reshape(-1)
    np.testing.assert_array_equal(flat, [False, True, True, False, False,
                                         False])


def test_dataset_frame_info(tmp_path):
    ann = dict(
        videos=[dict(id=1, name='v')],
        images=[dict(id=10, video_id=1, frame_id=0, width=8, height=6,
                     file_name='v/0.jpg')],
        categories=[dict(id=7, name='person')],
        annotations=[dict(id=100, image_id=10, video_id=1, instance_id=3,
                          category_id=7, bbox=[2, 1, 4, 3],
                          segmentation=[[2, 1, 6, 1, 6, 4, 2, 4]],
                          area=12, iscrowd=0)])
    f = tmp_path / 'ann.json'
    f.write_text(json.dumps(ann))
    ds = YouTubeVISDataset(str(f))
    assert ds.videos() == [1]
    info = ds.frame_info(10)
    np.testing.assert_allclose(info['bboxes'][0], [2, 1, 6, 4])
    assert info['instance_ids'][0] == 3
    assert info['masks'][0].shape == (6, 8)
    assert info['masks'][0][2, 3]
