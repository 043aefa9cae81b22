"""SOT data layer: video datasets (GOT10k / LaSOT / TrackingNet / OTB),
pair/trident/dimp frame sampling, and the SiamFC/Stark/DiMP training
crops + sequence augmentations.

Host-side numpy re-creation of the reference's SOT pipeline:

* datasets   /root/reference/mmtrack/datasets/{base_sot_dataset,
  got10k_dataset, lasot_dataset, trackingnet_dataset, otb_dataset}.py —
  per-video ``groundtruth.txt`` (x,y,w,h rows) plus the per-benchmark
  visibility sidecars (GOT10k absence/cover, LaSOT full_occlusion /
  out_of_view);
* sampling   /root/reference/mmtrack/datasets/transforms/processing.py
  (PairSampling :444-570 — template frame + nearby positive search frame
  or negative frame from another video; TridentSampling / DiMPSampling —
  template+search sets within ``max_frame_range`` over visible frames);
* crops/augs /root/reference/mmtrack/datasets/transforms/transforms.py
  (CropLikeSiamFC :19-160 exact math incl. the generated center box;
  SeqCropLikeStark zero-padded jittered crops with attention masks;
  SeqBboxJitter :517-607 log-scale + center jitter; brightness / gray /
  color-mix / blur sequence augs).
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# crops
# ---------------------------------------------------------------------------

def crop_image(image: np.ndarray, crop_region: Sequence[float],
               crop_size: int, padding) -> np.ndarray:
    """Crop ``crop_region`` (x1, y1, x2, y2, may exceed the image) padded
    with ``padding``, resized to (crop_size, crop_size) — the
    mmtrack.utils.crop_image helper CropLikeSiamFC relies on."""
    import PIL.Image

    x1, y1, x2, y2 = [int(round(float(v))) for v in crop_region]
    h, w = image.shape[:2]
    out = np.empty((y2 - y1, x2 - x1, image.shape[2]), image.dtype)
    out[...] = np.asarray(padding, image.dtype)
    sx1, sy1 = max(x1, 0), max(y1, 0)
    sx2, sy2 = min(x2, w), min(y2, h)
    out[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = image[sy1:sy2, sx1:sx2]
    im = PIL.Image.fromarray(out.astype(np.uint8))
    im = im.resize((crop_size, crop_size), PIL.Image.BILINEAR)
    return np.asarray(im)


def crop_like_siamfc(image: np.ndarray, bbox_xyxy: np.ndarray,
                     context_amount: float = 0.5, exemplar_size: int = 127,
                     crop_size: int = 511) -> np.ndarray:
    """transforms.py:58-97 exact math."""
    padding = np.mean(image, axis=(0, 1)).tolist()
    b = np.array([0.5 * (bbox_xyxy[2] + bbox_xyxy[0]),
                  0.5 * (bbox_xyxy[3] + bbox_xyxy[1]),
                  bbox_xyxy[2] - bbox_xyxy[0],
                  bbox_xyxy[3] - bbox_xyxy[1]])
    z_w = b[2] + context_amount * (b[2] + b[3])
    z_h = b[3] + context_amount * (b[2] + b[3])
    z_size = np.sqrt(z_w * z_h)
    z_scale = exemplar_size / z_size
    d_search = (crop_size - exemplar_size) / 2.0
    pad = d_search / z_scale
    x_size = z_size + 2 * pad
    region = [b[0] - 0.5 * x_size, b[1] - 0.5 * x_size,
              b[0] + 0.5 * x_size, b[1] + 0.5 * x_size]
    return crop_image(image, region, crop_size, padding)


def siamfc_generated_box(crop_shape: Tuple[int, int], bbox_xyxy: np.ndarray,
                         context_amount: float = 0.5,
                         exemplar_size: int = 127) -> np.ndarray:
    """transforms.py:101-130: the gt box re-centered in the crop."""
    img_h, img_w = crop_shape[:2]
    w = bbox_xyxy[2] - bbox_xyxy[0]
    h = bbox_xyxy[3] - bbox_xyxy[1]
    z_w = w + context_amount * (w + h)
    z_h = h + context_amount * (w + h)
    z_scale = np.sqrt(z_w * z_h)
    f = exemplar_size / z_scale
    w, h = w * f, h * f
    cx, cy = img_w // 2, img_h // 2
    return np.array([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w,
                     cy + 0.5 * h], np.float32)


def crop_like_stark(image: np.ndarray, jittered_bbox_xyxy: np.ndarray,
                    gt_bbox_xyxy: np.ndarray, crop_size_factor: float,
                    output_size: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stark training crop (SeqCropLikeStark semantics): zero-padded
    ``crop_size_factor * sqrt(w*h)`` square around the JITTERED box,
    resized to ``output_size``; returns (crop, padding_mask,
    transformed gt bbox in crop coords)."""
    import PIL.Image

    jb = jittered_bbox_xyxy
    w = jb[2] - jb[0]
    h = jb[3] - jb[1]
    cx, cy = (jb[0] + jb[2]) / 2, (jb[1] + jb[3]) / 2
    crop_sz = int(np.ceil(np.sqrt(max(w * h, 1.0)) * crop_size_factor))
    x1 = int(round(cx - crop_sz * 0.5))
    y1 = int(round(cy - crop_sz * 0.5))
    x2, y2 = x1 + crop_sz, y1 + crop_sz

    ih, iw = image.shape[:2]
    patch = np.zeros((crop_sz, crop_sz, image.shape[2]), image.dtype)
    mask = np.ones((crop_sz, crop_sz), np.float32)
    sx1, sy1 = max(x1, 0), max(y1, 0)
    sx2, sy2 = min(x2, iw), min(y2, ih)
    patch[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = image[sy1:sy2, sx1:sx2]
    mask[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = 0.0

    resize_factor = output_size / crop_sz
    im = PIL.Image.fromarray(patch.astype(np.uint8))
    crop = np.asarray(im.resize((output_size, output_size),
                                PIL.Image.BILINEAR))
    mk = PIL.Image.fromarray((mask * 255).astype(np.uint8))
    mask_out = np.asarray(mk.resize((output_size, output_size),
                                    PIL.Image.BILINEAR)) > 0

    gt = np.asarray(gt_bbox_xyxy, np.float64)
    out_bbox = np.array([gt[0] - x1, gt[1] - y1, gt[2] - x1, gt[3] - y1])
    out_bbox = (out_bbox * resize_factor).astype(np.float32)
    return crop, mask_out.astype(np.float32), out_bbox


def seq_bbox_jitter(bboxes_xyxy: Sequence[np.ndarray],
                    scale_jitter_factor: Sequence[float],
                    center_jitter_factor: Sequence[float],
                    crop_size_factor: Sequence[float],
                    rng: Optional[np.random.RandomState] = None
                    ) -> Optional[List[np.ndarray]]:
    """transforms.py:553-607 exact procedure (per-entry log-scale size
    jitter with crop-size validity retry, uniform center jitter)."""
    rng = rng or np.random
    out = []
    for i, gt in enumerate(bboxes_xyxy):
        gt = np.asarray(gt, np.float64).reshape(4)
        wh = gt[2:] - gt[:2]
        c = gt[:2] + wh / 2
        crop_sz = -1
        count = 0
        while crop_sz < 1:
            count += 1
            if count > 100:
                return None
            jwh = wh * np.exp(rng.randn(2) * scale_jitter_factor[i])
            crop_sz = np.ceil(np.sqrt(jwh.prod()) * crop_size_factor[i])
        max_offset = np.sqrt(jwh.prod()) * center_jitter_factor[i]
        jc = c + max_offset * (rng.rand(2) - 0.5)
        out.append(np.concatenate([jc - jwh / 2, jc + jwh / 2])
                   .astype(np.float32))
    return out


# ---------------------------------------------------------------------------
# sequence augmentations (transforms.py:608-990, capability-faithful)
# ---------------------------------------------------------------------------

def brightness_aug(img: np.ndarray, jitter_range: float = 0.3,
                   rng=None) -> np.ndarray:
    rng = rng or np.random
    alpha = 1.0 + jitter_range * (2 * rng.rand() - 1)
    return np.clip(img * alpha, 0, 255)


def gray_aug(img: np.ndarray, prob: float = 0.2, rng=None) -> np.ndarray:
    rng = rng or np.random
    if rng.rand() < prob:
        g = img @ np.array([0.114, 0.587, 0.299])
        return np.stack([g, g, g], -1)
    return img


def color_aug(img: np.ndarray, rng=None) -> np.ndarray:
    """SeqColorAug: random channel-mixing matrix near identity."""
    rng = rng or np.random
    mix = np.eye(3) + (rng.rand(3, 3) - 0.5) * 0.1
    return np.clip(img @ mix.T, 0, 255)


def blur_aug(img: np.ndarray, prob: float = 0.2, rng=None) -> np.ndarray:
    rng = rng or np.random
    if rng.rand() >= prob:
        return img
    sigma = 0.5 + rng.rand() * 2.0
    k = int(np.ceil(2 * sigma))
    x = np.arange(-k, k + 1)
    w = np.exp(-x ** 2 / (2 * sigma ** 2))
    w = w / w.sum()
    out = np.apply_along_axis(
        lambda v: np.convolve(v, w, mode='same'), 0, img)
    return np.apply_along_axis(
        lambda v: np.convolve(v, w, mode='same'), 1, out)


# ---------------------------------------------------------------------------
# frame sampling (processing.py)
# ---------------------------------------------------------------------------

def pair_sampling(video_info: dict, other_video_info: dict,
                  frame_range: int = 5, pos_prob: float = 0.8,
                  filter_template_img: bool = False, rng=None) -> dict:
    """PairSampling (processing.py:444-570): a template frame plus either
    a nearby search frame (positive, label 1) or a random frame of
    ANOTHER video (negative, label 0)."""
    rng = rng or np.random
    n = len(video_info['frame_ids'])
    if n <= 1 or len(other_video_info['frame_ids']) <= 1:
        idx = 0 if n else 0
        return dict(template=(video_info, idx), search=(video_info, idx),
                    is_positive=True)
    t = int(rng.choice(n))
    if pos_prob > rng.random_sample():
        left = max(t - frame_range, 0)
        right = min(t + frame_range, n)
        cands = list(range(left, right))
        if filter_template_img and t in cands:
            cands.remove(t)
        s = int(rng.choice(cands)) if cands else t
        return dict(template=(video_info, t), search=(video_info, s),
                    is_positive=True)
    s = int(rng.choice(len(other_video_info['frame_ids'])))
    return dict(template=(video_info, t),
                search=(other_video_info, s), is_positive=False)


def trident_sampling(video_info: dict, num_template_frames: int = 2,
                     num_search_frames: int = 1,
                     max_frame_range: int = 200, rng=None
                     ) -> Optional[dict]:
    """TridentSampling (Stark): one base template, extra templates and
    search frames among VISIBLE frames within ``max_frame_range``."""
    rng = rng or np.random
    visible = np.asarray(video_info.get(
        'visible', np.ones(len(video_info['frame_ids']), bool)))
    vis_idx = np.flatnonzero(visible)
    if len(vis_idx) < num_template_frames + num_search_frames:
        return None
    base = int(rng.choice(vis_idx))
    window = vis_idx[np.abs(vis_idx - base) <= max_frame_range]
    if len(window) < num_template_frames + num_search_frames:
        return None
    picks = rng.choice(window, num_template_frames + num_search_frames,
                       replace=False)
    return dict(template_inds=[base] + [int(i) for i in
                                        picks[:num_template_frames - 1]],
                search_inds=[int(i) for i in
                             picks[num_template_frames - 1:][:
                                                             num_search_frames]])


def dimp_sampling(video_info: dict, num_template_frames: int = 3,
                  num_search_frames: int = 3, max_gap: int = 200,
                  rng=None) -> Optional[dict]:
    """DiMPSampling (processing.py:14-242): template frames then search
    frames AFTER them within ``max_gap``, visible-only."""
    rng = rng or np.random
    visible = np.asarray(video_info.get(
        'visible', np.ones(len(video_info['frame_ids']), bool)))
    vis_idx = np.flatnonzero(visible)
    if len(vis_idx) < num_template_frames + num_search_frames:
        return None
    base = int(rng.choice(vis_idx[:max(1, len(vis_idx)
                                       - num_search_frames)]))
    before = vis_idx[(vis_idx <= base)
                     & (vis_idx >= base - max_gap)]
    after = vis_idx[(vis_idx > base) & (vis_idx <= base + max_gap)]
    if len(before) < num_template_frames or len(after) < num_search_frames:
        return None
    t = rng.choice(before, num_template_frames, replace=False)
    s = rng.choice(after, num_search_frames, replace=False)
    return dict(template_inds=sorted(int(i) for i in t),
                search_inds=sorted(int(i) for i in s))


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------

class SOTVideoDataset:
    """Per-video SOT annotation loader: each video directory holds frames
    and a ``groundtruth.txt`` of comma-separated x,y,w,h rows
    (base_sot_dataset.py contract). Subclasses add visibility sidecars."""

    img_glob = '*.jpg'

    def __init__(self, data_root: str,
                 video_names: Optional[Sequence[str]] = None):
        self.data_root = data_root
        if video_names is None:
            video_names = sorted(
                d for d in os.listdir(data_root)
                if osp.isdir(osp.join(data_root, d)))
        self.video_names = list(video_names)

    def __len__(self):
        return len(self.video_names)

    def _frames(self, vdir: str) -> List[str]:
        import glob
        frames = sorted(glob.glob(osp.join(vdir, '*.jpg')))
        if not frames:
            frames = sorted(glob.glob(osp.join(vdir, 'img', '*.jpg')))
        return frames

    def _visible(self, vdir: str, n: int) -> np.ndarray:
        return np.ones(n, bool)

    def video_info(self, idx: int) -> dict:
        name = self.video_names[idx]
        vdir = osp.join(self.data_root, name)
        frames = self._frames(vdir)
        gt_file = osp.join(vdir, 'groundtruth.txt')
        bboxes = np.loadtxt(gt_file, delimiter=',', ndmin=2,
                            dtype=np.float64)
        bboxes = bboxes.reshape(-1, 4)
        xyxy = np.concatenate([bboxes[:, :2],
                               bboxes[:, :2] + bboxes[:, 2:]], 1)
        n = min(len(frames), len(xyxy))
        valid = (bboxes[:n, 2] > 0) & (bboxes[:n, 3] > 0)
        return dict(video_id=idx, video_length=n,
                    img_paths=frames[:n],
                    frame_ids=list(range(n)),
                    bboxes=xyxy[:n].astype(np.float32),
                    bboxes_isvalid=valid,
                    visible=self._visible(vdir, n) & valid)


class Got10kDataset(SOTVideoDataset):
    """GOT10k: ``absence.label`` / ``cover.label`` sidecars
    (got10k_dataset.py: visible = ~absence & cover > 0)."""

    def _visible(self, vdir: str, n: int) -> np.ndarray:
        absence = osp.join(vdir, 'absence.label')
        cover = osp.join(vdir, 'cover.label')
        vis = np.ones(n, bool)
        if osp.exists(absence):
            a = np.loadtxt(absence, dtype=int, ndmin=1)[:n]
            vis[:len(a)] &= a == 0
        if osp.exists(cover):
            c = np.loadtxt(cover, dtype=int, ndmin=1)[:n]
            vis[:len(c)] &= c > 0
        return vis


class LaSOTDataset(SOTVideoDataset):
    """LaSOT: ``full_occlusion.txt`` / ``out_of_view.txt`` sidecars."""

    def _visible(self, vdir: str, n: int) -> np.ndarray:
        vis = np.ones(n, bool)
        for fname in ('full_occlusion.txt', 'out_of_view.txt'):
            p = osp.join(vdir, fname)
            if osp.exists(p):
                flags = np.loadtxt(p, delimiter=',', dtype=int,
                                   ndmin=1)[:n]
                vis[:len(flags)] &= flags == 0
        return vis


class TrackingNetDataset(SOTVideoDataset):
    """TrackingNet: anno/<video>.txt instead of in-dir groundtruth
    (trackingnet_dataset.py); frames under frames/<video>/<i>.jpg."""

    def __init__(self, data_root: str,
                 video_names: Optional[Sequence[str]] = None):
        frames_dir = osp.join(data_root, 'frames')
        root = frames_dir if osp.isdir(frames_dir) else data_root
        super().__init__(root, video_names)
        self.anno_dir = osp.join(data_root, 'anno')

    def video_info(self, idx: int) -> dict:
        name = self.video_names[idx]
        vdir = osp.join(self.data_root, name)
        import glob
        frames = sorted(glob.glob(osp.join(vdir, '*.jpg')),
                        key=lambda p: int(osp.splitext(osp.basename(p))[0]))
        anno = osp.join(self.anno_dir, f'{name}.txt')
        bboxes = np.loadtxt(anno, delimiter=',', ndmin=2,
                            dtype=np.float64).reshape(-1, 4)
        xyxy = np.concatenate([bboxes[:, :2],
                               bboxes[:, :2] + bboxes[:, 2:]], 1)
        n = min(len(frames), len(xyxy))
        valid = (bboxes[:n, 2] > 0) & (bboxes[:n, 3] > 0)
        return dict(video_id=idx, video_length=n, img_paths=frames[:n],
                    frame_ids=list(range(n)),
                    bboxes=xyxy[:n].astype(np.float32),
                    bboxes_isvalid=valid, visible=valid.copy())


class RandomSampleConcatDataset:
    """Weighted random sampling over several datasets
    (/root/reference/mmtrack/datasets/dataset_wrappers.py:11-59): each
    __getitem__ ignores the index, samples a dataset by weight and a
    uniform item within it, retrying on None results."""

    def __init__(self, datasets: Sequence, weights=None, rng=None):
        self.datasets = list(datasets)
        if weights is None:
            weights = [1.0] * len(self.datasets)
        assert all(w >= 0 for w in weights) and sum(weights) > 0
        total = float(sum(weights))
        self.probs = [w / total for w in weights]
        self.rng = rng or np.random

    def __len__(self):
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, _ind: int):
        while True:
            di = int(self.rng.choice(len(self.datasets), p=self.probs))
            ds = self.datasets[di]
            item = ds[int(self.rng.randint(0, len(ds)))]
            if item is not None:
                return item


class OTB100Dataset(SOTVideoDataset):
    """OTB: per-video ``groundtruth_rect.txt`` with comma- or
    tab-separated x,y,w,h (otb_dataset.py; a handful of sequences start
    at an ``init_omit`` offset — supported via the optional
    ``init_omit`` map)."""

    def __init__(self, data_root, video_names=None,
                 init_omit: Optional[Dict[str, int]] = None):
        super().__init__(data_root, video_names)
        self.init_omit = init_omit or {}

    def video_info(self, idx: int) -> dict:
        name = self.video_names[idx]
        vdir = osp.join(self.data_root, name)
        frames = self._frames(vdir)
        gt_file = osp.join(vdir, 'groundtruth_rect.txt')
        rows = []
        with open(gt_file) as f:
            for line in f:
                line = line.strip().replace('\t', ',').replace(' ', ',')
                if line:
                    rows.append([float(v) for v in line.split(',') if v])
        bboxes = np.asarray(rows, np.float64).reshape(-1, 4)
        omit = self.init_omit.get(name, 0)
        bboxes = bboxes[omit:]
        frames = frames[omit:]
        xyxy = np.concatenate([bboxes[:, :2],
                               bboxes[:, :2] + bboxes[:, 2:]], 1)
        n = min(len(frames), len(xyxy))
        valid = (bboxes[:n, 2] > 0) & (bboxes[:n, 3] > 0)
        return dict(video_id=idx, video_length=n, img_paths=frames[:n],
                    frame_ids=list(range(n)),
                    bboxes=xyxy[:n].astype(np.float32),
                    bboxes_isvalid=valid, visible=valid.copy())


class UAV123Dataset(OTB100Dataset):
    """UAV123 shares the OTB groundtruth_rect layout (uav123_dataset.py);
    NaN rows mark out-of-view frames."""

    def video_info(self, idx: int) -> dict:
        info = super().video_info(idx)
        nan = np.isnan(info['bboxes']).any(axis=1)
        info['bboxes'] = np.nan_to_num(info['bboxes'])
        info['bboxes_isvalid'] &= ~nan
        info['visible'] &= ~nan
        return info


class VOTDataset(SOTVideoDataset):
    """VOT: per-video ``groundtruth.txt`` of 8-value rotated polygons
    (vot_dataset.py); boxes are the polygon's axis-aligned hull, the
    polygon is kept under ``polygons`` for region-overlap evaluation."""

    def video_info(self, idx: int) -> dict:
        name = self.video_names[idx]
        vdir = osp.join(self.data_root, name)
        frames = self._frames(vdir)
        if not frames:
            import glob
            frames = sorted(glob.glob(osp.join(vdir, 'color', '*.jpg')))
        rows = np.loadtxt(osp.join(vdir, 'groundtruth.txt'),
                          delimiter=',', ndmin=2, dtype=np.float64)
        if rows.shape[1] == 4:
            xyxy = np.concatenate([rows[:, :2],
                                   rows[:, :2] + rows[:, 2:]], 1)
            polys = None
        else:
            xs = rows[:, 0::2]
            ys = rows[:, 1::2]
            xyxy = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], 1)
            polys = rows
        n = min(len(frames), len(xyxy))
        valid = (xyxy[:n, 2] > xyxy[:n, 0]) & (xyxy[:n, 3] > xyxy[:n, 1])
        info = dict(video_id=idx, video_length=n, img_paths=frames[:n],
                    frame_ids=list(range(n)),
                    bboxes=xyxy[:n].astype(np.float32),
                    bboxes_isvalid=valid, visible=valid.copy())
        if polys is not None:
            info['polygons'] = polys[:n].astype(np.float32)
        return info


class SOTCocoDataset:
    """COCO instances as single-frame SOT "videos" for crop-pair training
    (sot_coco_dataset.py:25-98: every non-crowd annotation is one video of
    length 1). Emits the same ``video_info`` contract as
    :class:`SOTVideoDataset` so the Pair/Trident/DiMP samplers and
    :class:`RandomSampleConcatDataset` mixing work unchanged."""

    def __init__(self, ann_file: str, img_prefix: str = '',
                 bbox_min_size: float = 0.0):
        from .coco_video import CocoVideo
        self.coco = CocoVideo(ann_file)
        self.img_prefix = img_prefix
        self.bbox_min_size = bbox_min_size
        self.ann_ids = [a_id for a_id, a in sorted(self.coco.anns.items())
                        if a.get('iscrowd', 0) == 0]

    def __len__(self):
        return len(self.ann_ids)

    def video_info(self, idx: int) -> dict:
        ann = self.coco.anns[self.ann_ids[idx]]
        img = self.coco.imgs[ann['image_id']]
        x, y, w, h = ann['bbox']
        xyxy = np.asarray([[x, y, x + w, y + h]], np.float32)
        valid = np.asarray([w > self.bbox_min_size
                            and h > self.bbox_min_size])
        return dict(video_id=idx, video_length=1,
                    img_paths=[osp.join(self.img_prefix,
                                        img['file_name'])],
                    frame_ids=[0], bboxes=xyxy, bboxes_isvalid=valid,
                    visible=valid.copy())


class SOTImageNetVIDDataset:
    """ImageNet-VID instances as SOT videos
    (sot_imagenet_vid_dataset.py:25-160: one video per ``instance_id``;
    frame ids come from the images' ``frame_id`` — NOT necessarily
    contiguous — and visibility is ``not ann['occluded']``)."""

    def __init__(self, ann_file: str, img_prefix: str = '',
                 bbox_min_size: float = 0.0):
        from .coco_video import CocoVideo
        self.coco = CocoVideo(ann_file)
        self.img_prefix = img_prefix
        self.bbox_min_size = bbox_min_size
        self.ins_ids = self.coco.get_ins_ids()

    def __len__(self):
        return len(self.ins_ids)

    def video_info(self, idx: int) -> dict:
        ins_id = self.ins_ids[idx]
        img_ids = self.coco.ins_to_imgs[ins_id]
        paths, frame_ids, bboxes, visible = [], [], [], []
        for img_id in img_ids:
            for ann in self.coco.load_anns(img_id):
                if ann.get('instance_id') == ins_id:
                    img = self.coco.imgs[img_id]
                    paths.append(osp.join(self.img_prefix,
                                          img['file_name']))
                    frame_ids.append(img.get('frame_id', 0))
                    bboxes.append(ann['bbox'])
                    visible.append(not ann.get('occluded', False))
        bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
        valid = (bboxes[:, 2] > self.bbox_min_size) \
            & (bboxes[:, 3] > self.bbox_min_size)
        xyxy = np.concatenate([bboxes[:, :2],
                               bboxes[:, :2] + bboxes[:, 2:]], 1)
        return dict(video_id=idx, video_length=len(paths),
                    img_paths=paths, frame_ids=frame_ids, bboxes=xyxy,
                    bboxes_isvalid=valid,
                    visible=np.asarray(visible, bool) & valid)


def siamrpn_unfreeze_prefixes(epoch: int, unfreeze_epoch: int = 10,
                              backbone_stages: int = 4):
    """SiamRPN backbone unfreeze schedule
    (engine/hooks/siamrpn_backbone_unfreeze_hook.py): before
    ``unfreeze_epoch`` the whole backbone is frozen; afterwards only the
    stem + stage 1 stay frozen. Returns parameter-path prefixes for the
    optimizer mask (see models/sot/resnet.frozen_param_paths)."""
    if epoch < unfreeze_epoch:
        return tuple(['conv1'] + [f'layer{i}_'
                                  for i in range(1, backbone_stages + 1)])
    return ('conv1', 'layer1_')


def check_pad_mask_validity(masks: Sequence[np.ndarray],
                            stride: int = 16) -> bool:
    """CheckPadMaskValidity (datasets/transforms/formatting.py): a Stark
    training sample is usable only if every crop keeps at least one
    fully-valid (non-padded) cell at feature stride — an all-padding
    attention mask would starve the transformer. Returns False when any
    mask fails (callers resample, like RandomSampleConcatDataset)."""
    for m in masks:
        m = np.asarray(m)
        h, w = m.shape[0] // stride * stride, m.shape[1] // stride * stride
        if h == 0 or w == 0:
            return False
        cells = m[:h, :w].reshape(h // stride, stride,
                                  w // stride, stride)
        cell_pad = cells.max(axis=(1, 3))      # 1 where any padding
        if (cell_pad > 0).all():
            return False
    return True
