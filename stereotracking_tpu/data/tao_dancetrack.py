"""TAO and DanceTrack dataset readers.

* :class:`TAODataset` re-creates the reference ``TaoDataset``
  (/root/reference/mmtrack/datasets/tao_dataset.py:34-81): a CocoVID
  video reader with the COCO-2014 -> 2017 file-name fix (:58-64) and the
  per-video federated annotation meta (``neg_category_ids`` /
  ``not_exhaustive_category_ids``) the TAO toolkit consumes
  (/root/reference/mmtrack/evaluation/metrics/tao_metrics.py:380-392).
* :class:`DanceTrackDataset` re-creates the reference
  ``DanceTrackDataset`` (= ``MOTChallengeDataset``,
  /root/reference/mmtrack/datasets/dancetrack_dataset.py), reading the raw
  MOT-challenge layout directly (seq/seqinfo.ini, seq/img1/%08d.jpg,
  seq/gt/gt.txt rows ``frame,id,x,y,w,h,conf,class,visibility``) so no
  offline converter is needed; ``load_frame`` synthesizes an all-invalid
  disparity so the monocular path drops into the stereo tools unchanged
  (depth extraction yields 0 -> scale 1, the reference's monocular OCSORT
  behavior).
"""
from __future__ import annotations

import configparser
import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from . import transforms as T
from .coco_video import CocoVideo
from .datasets import _parse_instances


class TAODataset:
    """Video-level TAO reader feeding the federated track-AP metric."""

    def __init__(self, ann_file: str, data_root: str = '',
                 img_prefix: str = '',
                 classes: Optional[tuple] = None):
        self.coco = CocoVideo(ann_file)
        self.data_root = data_root
        self.img_prefix = img_prefix
        cat_ids = self.coco.cat_ids()
        if classes is not None:
            name_to_id = {c['name']: cid for cid, c in self.coco.cats.items()}
            cat_ids = [name_to_id[c] for c in classes if c in name_to_id]
        self.cat2label = {cid: i for i, cid in enumerate(cat_ids)}
        self.vid_ids = self.coco.get_vid_ids()

    def __len__(self):
        return sum(len(self.coco.get_img_ids_from_vid(v))
                   for v in self.vid_ids)

    def videos(self) -> List[int]:
        return self.vid_ids

    def video_name(self, vid: int) -> str:
        return self.coco.videos[vid].get(
            'name', self.coco.videos[vid].get('file_name', str(vid)))

    def video_frames(self, vid: int) -> List[int]:
        return self.coco.get_img_ids_from_vid(vid)

    def video_meta(self, vid: int) -> Dict[str, list]:
        """Federated annotation meta of one video (falling back to the
        first frame's image-level lists, where TAO also stores them)."""
        v = self.coco.videos[vid]
        neg = v.get('neg_category_ids')
        nex = v.get('not_exhaustive_category_ids')
        if neg is None or nex is None:
            imgs = self.video_frames(vid)
            first = self.coco.load_img(imgs[0]) if imgs else {}
            neg = first.get('neg_category_ids', []) if neg is None else neg
            nex = first.get('not_exhaustive_category_ids', []) \
                if nex is None else nex
        return dict(neg_category_ids=list(neg or []),
                    not_exhaustive_category_ids=list(nex or []))

    def register_federated_meta(self, metric) -> None:
        """Push every video's neg / not-exhaustive lists (mapped to
        contiguous labels) into a :class:`TAOMetric`."""
        for vid in self.vid_ids:
            meta = self.video_meta(vid)
            metric.add_video_meta(
                self.video_name(vid),
                [self.cat2label[c] for c in meta['neg_category_ids']
                 if c in self.cat2label],
                [self.cat2label[c]
                 for c in meta['not_exhaustive_category_ids']
                 if c in self.cat2label])

    @staticmethod
    def _fix_file_name(file_name: str) -> str:
        """COCO_[split]2014_000000000000.jpg -> 000000000000.jpg
        (tao_dataset.py:58-64)."""
        if osp.basename(file_name).startswith('COCO'):
            return osp.join(osp.dirname(file_name),
                            osp.basename(file_name)[-16:])
        return file_name

    def frame_info(self, img_id: int) -> dict:
        img = self.coco.load_img(img_id)
        fname = self._fix_file_name(img['file_name'])
        info = dict(
            img_id=img_id,
            img_path=osp.join(self.data_root, self.img_prefix, fname),
            video_id=img.get('video_id', -1),
            frame_id=img.get('frame_id', img.get('frame_index', 0)),
            width=img['width'], height=img['height'])
        info.update(_parse_instances(
            self.coco.load_anns(img_id), self.cat2label,
            img['width'], img['height'], with_track=True))
        return info

    def load_frame(self, img_id: int) -> dict:
        sample = dict(self.frame_info(img_id))
        sample['img'] = T.load_image(sample['img_path'])
        return sample

    def gt_tracks(self, vid: int) -> Dict[int, Dict[str, dict]]:
        """{instance_id -> {'label', 'track': {frame -> xyxy}}} for
        feeding TAOMetric.add_gt_track."""
        tracks: Dict[int, dict] = {}
        for f_idx, img_id in enumerate(self.video_frames(vid)):
            info = self.frame_info(img_id)
            for b, l, i in zip(info['gt_bboxes'], info['gt_labels'],
                               info['gt_instance_ids']):
                rec = tracks.setdefault(int(i), dict(label=int(l), track={}))
                rec['track'][f_idx] = np.asarray(b, np.float64)
        return tracks


class DanceTrackDataset:
    """Raw MOT-challenge layout reader (DanceTrack / MOT17-style)."""

    GT_CLASSES = ('dancer',)

    def __init__(self, data_root: str, split: str = 'train',
                 visibility_thr: float = -1.0):
        self.data_root = data_root
        self.split_dir = osp.join(data_root, split)
        self.visibility_thr = visibility_thr
        seqs = sorted(d for d in os.listdir(self.split_dir)
                      if osp.isdir(osp.join(self.split_dir, d)))
        self._videos = []
        self._frames: Dict[str, List[dict]] = {}
        next_img_id = 1
        for seq in seqs:
            seq_dir = osp.join(self.split_dir, seq)
            meta = self._read_seqinfo(seq_dir)
            gt = self._read_gt(osp.join(seq_dir, 'gt', 'gt.txt'))
            frames = []
            for f in range(1, meta['seqLength'] + 1):
                rows = gt.get(f, np.zeros((0, 9)))
                keep = rows[:, 8] >= self.visibility_thr if len(rows) \
                    else np.zeros(0, bool)
                rows = rows[keep]
                x1y1 = rows[:, 2:4]
                frames.append(dict(
                    img_id=next_img_id,
                    img_path=osp.join(seq_dir, meta['imDir'],
                                      f'{f:0{meta["imExt_digits"]}d}'
                                      f'{meta["imExt"]}'),
                    video_id=seq, frame_id=f - 1,
                    width=meta['imWidth'], height=meta['imHeight'],
                    gt_bboxes=np.concatenate(
                        [x1y1, x1y1 + rows[:, 4:6]], axis=1)
                    .astype(np.float32),
                    gt_labels=np.zeros(len(rows), np.int64),
                    gt_instance_ids=rows[:, 1].astype(np.int64),
                    gt_ignore=rows[:, 6] == 0,     # conf 0 = ignore region
                    gt_visibility=rows[:, 8].astype(np.float32),
                    gt_locations=np.full((len(rows), 3), -1, np.float32)))
                next_img_id += 1
            self._videos.append(seq)
            self._frames[seq] = frames

    @staticmethod
    def _read_seqinfo(seq_dir: str) -> dict:
        path = osp.join(seq_dir, 'seqinfo.ini')
        out = dict(imDir='img1', imExt='.jpg', imExt_digits=8,
                   imWidth=1920, imHeight=1080, seqLength=0)
        if osp.exists(path):
            cp = configparser.ConfigParser()
            cp.read(path)
            s = cp['Sequence']
            out.update(imDir=s.get('imDir', 'img1'),
                       imExt=s.get('imExt', '.jpg'),
                       imWidth=int(s.get('imWidth', 1920)),
                       imHeight=int(s.get('imHeight', 1080)),
                       seqLength=int(s.get('seqLength', 0)))
        img_dir = osp.join(seq_dir, out['imDir'])
        if osp.isdir(img_dir):
            names = [x for x in os.listdir(img_dir)
                     if x.endswith(out['imExt'])]
            if names:
                # infer zero-pad width (8 for DanceTrack, 6 for MOT17)
                out['imExt_digits'] = len(osp.splitext(sorted(names)[0])[0])
            if not out['seqLength']:
                out['seqLength'] = len(names)
        return out

    @staticmethod
    def _read_gt(path: str) -> Dict[int, np.ndarray]:
        by_frame: Dict[int, list] = {}
        if osp.exists(path):
            with open(path) as fh:
                for line in fh:
                    vals = [float(v) for v in line.strip().split(',') if v]
                    if len(vals) < 6:
                        continue
                    vals = (vals + [1.0, 1.0, 1.0])[:9]
                    by_frame.setdefault(int(vals[0]), []).append(vals)
        return {f: np.asarray(rows, np.float64)
                for f, rows in by_frame.items()}

    # -- MOTDispDataset-compatible video API -------------------------------
    def videos(self) -> List[str]:
        return list(self._videos)

    def video_name(self, vid: str) -> str:
        return vid

    def video_frames(self, vid: str) -> List[int]:
        return [f['img_id'] for f in self._frames[vid]]

    def frame_info(self, img_id: int) -> dict:
        for frames in self._frames.values():
            i = img_id - frames[0]['img_id']
            if 0 <= i < len(frames):
                return dict(frames[i])
        raise KeyError(img_id)

    def load_frame(self, img_id: int) -> dict:
        sample = self.frame_info(img_id)
        sample['img'] = T.load_image(sample['img_path'])
        h, w = sample['img'].shape[:2]
        # monocular: all-invalid disparity (mask 0 everywhere -> depth 0,
        # scale 1 in the depth module)
        sample['disp_postp'] = np.zeros((h, w), np.float32)
        sample['disp_mask'] = np.zeros((h, w), np.float32)
        return sample

    def __len__(self):
        return sum(len(v) for v in self._frames.values())
