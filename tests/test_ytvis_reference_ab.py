"""A/B the YouTube-VIS mask-track AP against the REFERENCE's own vendored
COCO-style machinery.

VERDICT r2 noted the track-AP scorers were certified only by hand-derived
fixtures.  This imports the actual reference ``YTVIS`` + ``YTVISeval``
(/root/reference/mmtrack/evaluation/functional/{ytvis,ytviseval}.py, never
copied into the repo) with the absent ``pycocotools`` stubbed at the import
boundary, and asserts the repo's
``stereotracking_tpu.evaluation.track_ap.YTVISMetric`` produces identical
track mAP / AP50 / AP75 on randomized multi-video mask-track worlds
(missing frames, spurious tracks, categories with no predictions).

The stub supplies only the RLE mask-geometry contract
(``area`` / ``merge`` / ``toBbox`` on dense boolean masks); the machinery
under test — the spatio-temporal ``iou_seq``, per-video greedy matching at
each IoU threshold, the precision-envelope 101-point interpolation, and
the category/threshold pooling — all runs from the reference files
themselves.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from stereotracking_tpu.evaluation.track_ap import YTVISMetric

REF_DIR = '/root/reference/mmtrack/evaluation/functional'

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_DIR, 'ytviseval.py')),
    reason='reference checkout not available')


# ---------------------------------------------------------------------------
# pycocotools.mask stub (import-boundary only).  "RLE" payloads are dense
# boolean masks: {'size': [h, w], 'counts': np.ndarray} — YTVIS.annToRLE
# passes such dicts through untouched (ytvis.py:289-294), so the polygon /
# uncompressed-RLE codecs are never reached.
# ---------------------------------------------------------------------------


def _area(rle):
    return float(np.asarray(rle['counts']).sum())


def _merge(rles, intersect=False):
    masks = [np.asarray(r['counts'], bool) for r in rles]
    out = masks[0]
    for m in masks[1:]:
        out = np.logical_and(out, m) if intersect else np.logical_or(out, m)
    return {'size': rles[0]['size'], 'counts': out}


def _toBbox(rle):
    m = np.asarray(rle['counts'], bool)
    if not m.any():
        return np.zeros(4)
    ys, xs = np.nonzero(m)
    return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                     ys.max() - ys.min() + 1], float)


def _decode(rle):
    return np.asarray(rle['counts'], np.uint8)


def _load_reference_modules():
    pct = types.ModuleType('pycocotools')
    mask_mod = types.ModuleType('pycocotools.mask')
    mask_mod.area = _area
    mask_mod.merge = _merge
    mask_mod.toBbox = _toBbox
    mask_mod.decode = _decode
    pct.mask = mask_mod
    saved = {k: sys.modules.get(k) for k in ('pycocotools',
                                             'pycocotools.mask')}
    sys.modules['pycocotools'] = pct
    sys.modules['pycocotools.mask'] = mask_mod
    # ytviseval.accumulate uses the long-removed np.float alias
    if not hasattr(np, 'float'):
        np.float = float
    try:
        mods = {}
        for name in ('ytvis', 'ytviseval'):
            spec = importlib.util.spec_from_file_location(
                f'ref_{name}', os.path.join(REF_DIR, f'{name}.py'))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            mods[name] = mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mods


@pytest.fixture(scope='module')
def ref():
    return _load_reference_modules()


# ---------------------------------------------------------------------------
# Randomized mask-track worlds.
# ---------------------------------------------------------------------------


def _rect_mask(h, w, cx, cy, bw, bh):
    m = np.zeros((h, w), bool)
    x0, x1 = int(max(0, cx - bw / 2)), int(min(w, cx + bw / 2))
    y0, y1 = int(max(0, cy - bh / 2)), int(min(h, cy + bh / 2))
    if x1 > x0 and y1 > y0:
        m[y0:y1, x0:x1] = True
    return m


def _make_world(rng, n_videos=3, n_cats=3):
    """Returns (videos, gt_tracks, pred_tracks); tracks are
    (video_id, category, score|None, {frame: mask})."""
    videos = []
    gt_tracks, pred_tracks = [], []
    for vid in range(1, n_videos + 1):
        h, w = int(rng.randint(40, 64)), int(rng.randint(48, 80))
        length = int(rng.randint(5, 9))
        videos.append((vid, w, h, length))
        for _ in range(int(rng.randint(2, 5))):
            cat = int(rng.randint(1, n_cats + 1))
            cx, cy = rng.uniform(8, w - 8), rng.uniform(8, h - 8)
            start = int(rng.randint(0, length - 2))
            end = int(rng.randint(start + 1, length))
            track = {}
            for f in range(start, end + 1):
                cx = np.clip(cx + rng.normal(0, 2), 4, w - 4)
                cy = np.clip(cy + rng.normal(0, 2), 4, h - 4)
                m = _rect_mask(h, w, cx, cy, rng.uniform(8, 16),
                               rng.uniform(6, 14))
                if m.any():
                    track[f] = m
            if track:
                gt_tracks.append((vid, cat, None, track))
                if rng.rand() < 0.3:
                    # near-exact copy: exercises the 0.75-0.95 thresholds
                    pt = {f: m.copy() for f, m in track.items()
                          if rng.rand() < 0.95}
                    if pt:
                        pred_tracks.append((vid, cat,
                                            float(rng.uniform(0.5, 1.0)), pt))
                if rng.rand() < 0.85:
                    # noisy copy of the gt track, some frames dropped
                    pt = {}
                    for f, m in track.items():
                        if rng.rand() < 0.15:
                            continue
                        ys, xs = np.nonzero(m)
                        dm = _rect_mask(h, w,
                                        xs.mean() + rng.normal(0, 2),
                                        ys.mean() + rng.normal(0, 2),
                                        (xs.max() - xs.min() + 1)
                                        * rng.uniform(0.8, 1.25),
                                        (ys.max() - ys.min() + 1)
                                        * rng.uniform(0.8, 1.25))
                        if dm.any():
                            pt[f] = dm
                    if pt:
                        # sometimes the wrong category
                        pcat = cat if rng.rand() < 0.9 else int(
                            rng.randint(1, n_cats + 1))
                        pred_tracks.append((vid, pcat,
                                            float(rng.uniform(0.3, 1.0)), pt))
        # spurious predictions
        for _ in range(int(rng.randint(1, 3))):
            cat = int(rng.randint(1, n_cats + 1))
            f0 = int(rng.randint(0, length))
            m = _rect_mask(h, w, rng.uniform(8, w - 8), rng.uniform(8, h - 8),
                           rng.uniform(6, 14), rng.uniform(6, 12))
            if m.any():
                pred_tracks.append((vid, cat, float(rng.uniform(0.05, 0.6)),
                                    {f0: m}))
    return videos, gt_tracks, pred_tracks


def _to_reference_format(videos, gt_tracks, pred_tracks):
    lengths = {vid: n for vid, _, _, n in videos}
    sizes = {vid: (h, w) for vid, w, h, _ in videos}

    def seg_list(vid, track):
        h, w = sizes[vid]
        return [{'size': [h, w], 'counts': track[f].copy()}
                if f in track else None for f in range(lengths[vid])]

    gt_json = {
        'videos': [{'id': vid, 'width': w, 'height': h}
                   for vid, w, h, _ in videos],
        'categories': [{'id': c, 'name': f'c{c}'} for c in (1, 2, 3)],
        'annotations': [
            {'id': i + 1, 'video_id': vid, 'category_id': cat,
             'segmentations': seg_list(vid, track),
             'areas': [float(track[f].sum()) if f in track else None
                       for f in range(lengths[vid])],
             'iscrowd': 0}
            for i, (vid, cat, _, track) in enumerate(gt_tracks)],
    }
    results = [
        {'video_id': vid, 'category_id': cat, 'score': score,
         'segmentations': seg_list(vid, track)}
        for vid, cat, score, track in pred_tracks]
    return gt_json, results


def _reference_stats(ref, gt_json, results):
    ytvis_gt = ref['ytvis'].YTVIS(gt_json)
    ytvis_dt = ytvis_gt.loadRes(results)
    ev = ref['ytviseval'].YTVISeval(ytvis_gt, ytvis_dt, 'segm')
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev.stats


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_ytvis_track_ap_matches_reference(ref, seed, capsys):
    rng = np.random.RandomState(seed)
    videos, gt_tracks, pred_tracks = _make_world(rng)

    met = YTVISMetric()
    for vid, cat, _, track in gt_tracks:
        met.add_gt_track(f'v{vid}', cat, track)
    for vid, cat, score, track in pred_tracks:
        met.add_pred_track(f'v{vid}', cat, score, track)
    ours = met.evaluate()

    gt_json, results = _to_reference_format(videos, gt_tracks, pred_tracks)
    stats = _reference_stats(ref, gt_json, results)
    capsys.readouterr()  # swallow the reference's prints

    assert ours['track_mAP'] == pytest.approx(stats[0], abs=1e-9)
    assert ours['track_AP50'] == pytest.approx(stats[1], abs=1e-9)
    assert ours['track_AP75'] == pytest.approx(stats[2], abs=1e-9)
