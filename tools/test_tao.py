"""Evaluate TAO box-track AP with federated category handling.

The TAO analog of tools/test_vis.py (reference
mmtrack/evaluation/metrics/tao_metrics.py + tao_dataset.py): streams each
video through the QDTrack tracker, accumulates per-id box tracks (majority
label, mean score — tao_metrics.py's per-track pooling), and scores them
with the federated TrackAP metric (per-video ``neg_category_ids`` /
``not_exhaustive_category_ids``)::

    python tools/test_tao.py --ann-file tao/validation.json \
        --data-root tao/frames --checkpoint work_dirs/qdtrack/e12.ckpt
"""
import argparse
import json
import os
import sys
from collections import Counter, defaultdict

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='TAO federated track-AP eval')
    p.add_argument('--ann-file', required=True)
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-classes', type=int, default=1)
    p.add_argument('--img-hw', type=int, nargs=2, default=(192, 320))
    p.add_argument('--no-federated', action='store_true')
    p.add_argument('--out', default=None, help='metrics.json path')
    p.add_argument('--max-videos', type=int, default=0)
    p.add_argument('--max-frames', type=int, default=0)
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import numpy as np

    import PIL.Image

    from stereotracking_tpu.data import TAODataset
    from stereotracking_tpu.evaluation.track_ap import TAOMetric
    from stereotracking_tpu.models.qdtrack import QDTrackModule, \
        QDTrackStreaming

    dataset = TAODataset(args.ann_file, args.data_root, args.img_prefix)
    h, w = args.img_hw

    module = QDTrackModule(num_classes=args.num_classes)
    variables = module.init(jax.random.PRNGKey(args.seed),
                            np.zeros((1, h, w, 3), np.float32))
    if args.checkpoint:
        from stereotracking_tpu.train.checkpoint import load_checkpoint
        variables = load_checkpoint(args.checkpoint, variables)
    tracker = QDTrackStreaming(variables, num_classes=args.num_classes)

    metric = TAOMetric(federated=not args.no_federated)
    dataset.register_federated_meta(metric)

    videos = dataset.videos()
    if args.max_videos:
        videos = videos[:args.max_videos]
    for vid in videos:
        vname = dataset.video_name(vid)
        for inst_id, rec in dataset.gt_tracks(vid).items():
            metric.add_gt_track(vname, rec['label'], rec['track'])

        frame_ids = dataset.video_frames(vid)
        if args.max_frames:
            frame_ids = frame_ids[:args.max_frames]
        pred_tracks = defaultdict(dict)     # id -> frame -> box
        pred_meta = defaultdict(list)       # id -> [(label, score)]
        for f_idx, img_id in enumerate(frame_ids):
            sample = dataset.load_frame(img_id)
            img = np.asarray(PIL.Image.fromarray(
                sample['img'].astype(np.uint8)).resize(
                    (w, h), PIL.Image.BILINEAR), np.float32)
            sx = sample['img'].shape[1] / w
            sy = sample['img'].shape[0] / h
            out = tracker.track(img[None], f_idx)
            valid = np.asarray(out['valid'])
            boxes = np.asarray(out['bboxes'])[valid]
            boxes = boxes * np.array([sx, sy, sx, sy])
            for b, l, s, i in zip(boxes,
                                  np.asarray(out['labels'])[valid],
                                  np.asarray(out['scores'])[valid],
                                  np.asarray(out['instances_id'])[valid]):
                pred_tracks[int(i)][f_idx] = b.astype(np.float64)
                pred_meta[int(i)].append((int(l), float(s)))
        for tid, track in pred_tracks.items():
            labels = Counter(l for l, _ in pred_meta[tid])
            label = labels.most_common(1)[0][0]
            score = float(np.mean([s for _, s in pred_meta[tid]]))
            metric.add_pred_track(vname, label, score, track)
        print(f'[test_tao] {vname}: {len(frame_ids)} frames, '
              f'{len(pred_tracks)} tracks', flush=True)

    results = metric.evaluate()
    print(json.dumps(results))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
        with open(args.out, 'w') as fh:
            json.dump(results, fh, indent=2)


if __name__ == '__main__':
    main()
