"""YouTube-VIS dataset: COCO-VID annotations with instance masks.

Re-creates /root/reference/mmtrack/datasets/youtube_vis_dataset.py (a
BaseVideoDataset whose annotations carry per-frame ``segmentation``)
without pycocotools: polygon segmentations rasterize via an even-odd
scanline fill and uncompressed RLE decodes directly (compressed COCO
RLE strings are out of scope here, cited — YouTube-VIS ships polygons).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .coco_video import CocoVideo

YOUTUBE_VIS_2019_CLASSES = (
    'person', 'giant_panda', 'lizard', 'parrot', 'skateboard', 'sedan',
    'ape', 'dog', 'snake', 'monkey', 'hand', 'rabbit', 'duck', 'cat',
    'cow', 'fish', 'train', 'horse', 'turtle', 'bear', 'motorbike',
    'giraffe', 'leopard', 'fox', 'deer', 'owl', 'surfboard', 'airplane',
    'truck', 'zebra', 'tiger', 'elephant', 'snowboard', 'boat', 'shark',
    'mouse', 'frog', 'eagle', 'earless_seal', 'tennis_racket')


def rasterize_polygon(polys: Sequence[Sequence[float]], h: int, w: int
                      ) -> np.ndarray:
    """Even-odd scanline fill of COCO-style flat [x1,y1,x2,y2,...]
    polygons into an (h, w) bool mask."""
    mask = np.zeros((h, w), bool)
    for poly in polys:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        if len(pts) < 3:
            continue
        xs, ys = pts[:, 0], pts[:, 1]
        y0 = max(int(np.floor(ys.min())), 0)
        y1 = min(int(np.ceil(ys.max())), h - 1)
        for row in range(y0, y1 + 1):
            yc = row + 0.5
            crossings = []
            for i in range(len(pts)):
                xA, yA = xs[i], ys[i]
                xB, yB = xs[(i + 1) % len(pts)], ys[(i + 1) % len(pts)]
                if (yA <= yc < yB) or (yB <= yc < yA):
                    t = (yc - yA) / (yB - yA)
                    crossings.append(xA + t * (xB - xA))
            crossings.sort()
            for k in range(0, len(crossings) - 1, 2):
                a = max(int(np.ceil(crossings[k] - 0.5)), 0)
                b = min(int(np.floor(crossings[k + 1] - 0.5)), w - 1)
                if b >= a:
                    mask[row, a:b + 1] ^= True
    return mask


def decode_uncompressed_rle(rle: Dict, h: int, w: int) -> np.ndarray:
    """COCO uncompressed RLE (counts list, column-major)."""
    counts = rle['counts']
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        flat[pos:pos + c] = val
        pos += c
        val = not val
    return flat.reshape(w, h).T


def decode_segmentation(seg, h: int, w: int) -> Optional[np.ndarray]:
    if seg is None:
        return None
    if isinstance(seg, dict):
        if isinstance(seg.get('counts'), list):
            return decode_uncompressed_rle(seg, h, w)
        raise NotImplementedError(
            'compressed COCO RLE strings are not supported here')
    return rasterize_polygon(seg, h, w)


class YouTubeVISDataset:
    """Video dataset over a COCO-VID file with instance segmentations.

    Streaming surface mirrors MOTDispDataset: videos() / video_frames()
    / frame_info(img_id) — frame_info adds ``masks`` (list of HxW bool
    or None) aligned with ``bboxes``/``instance_ids``."""

    def __init__(self, ann_file: str,
                 classes: Sequence[str] = YOUTUBE_VIS_2019_CLASSES):
        self.coco = CocoVideo(ann_file)
        self.classes = tuple(classes)
        self.cat2label = {c: i for i, c in enumerate(self.coco.cat_ids())}

    def videos(self) -> List[int]:
        return self.coco.get_vid_ids()

    def video_frames(self, vid: int) -> List[int]:
        return self.coco.get_img_ids_from_vid(vid)

    def frame_info(self, img_id: int) -> dict:
        img = self.coco.load_img(img_id)
        h, w = img['height'], img['width']
        anns = self.coco.load_anns(img_id)
        bboxes, labels, ids, masks = [], [], [], []
        for a in anns:
            x, y, bw, bh = a['bbox']
            bboxes.append([x, y, x + bw, y + bh])
            labels.append(self.cat2label[a['category_id']])
            ids.append(a.get('instance_id', a.get('id', -1)))
            masks.append(decode_segmentation(a.get('segmentation'), h, w))
        return dict(
            img_id=img_id, video_id=img.get('video_id', -1),
            frame_id=img.get('frame_id', 0), width=w, height=h,
            file_name=img.get('file_name', ''),
            bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32),
            instance_ids=np.asarray(ids, np.int64), masks=masks)
