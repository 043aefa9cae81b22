"""Evaluate a single-object tracker with the OPE protocol.

The SOT analog of tools/test.py (reference tools/test.py driving
SOTMetric, mmtrack/evaluation/metrics/sot_metrics.py): run the tracker
once per video from the first-frame ground truth (no re-init), then
report success AUC / precision / norm-precision, or dump GOT10k /
TrackingNet submission files for the held-out test splits::

    python tools/test_sot.py --data-root otb100 --dataset otb100 \
        --tracker siamrpn --checkpoint work_dirs/siamrpn/siamrpn_e20.ckpt

    python tools/test_sot.py --data-root got10k/test --dataset got10k \
        --tracker stark --dump got10k --out-dir results/got10k
"""
import argparse
import json
import os
import sys
import time

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='SOT OPE evaluation')
    p.add_argument('--data-root', required=True)
    p.add_argument('--dataset', default='generic',
                   choices=['got10k', 'lasot', 'trackingnet', 'otb100',
                            'uav123', 'vot', 'generic'])
    p.add_argument('--tracker', default='siamrpn',
                   choices=['siamrpn', 'stark', 'prdimp'])
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-dir', default=None,
                   help='directory for dump formats / metrics.json')
    p.add_argument('--dump', default=None,
                   choices=[None, 'got10k', 'trackingnet'],
                   help='write submission files instead of scoring')
    p.add_argument('--max-videos', type=int, default=0,
                   help='limit for smoke runs (0 = all)')
    p.add_argument('--max-frames', type=int, default=0,
                   help='per-video frame limit for smoke runs (0 = all)')
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    import numpy as np
    import PIL.Image

    from stereotracking_tpu.apis.inference import (inference_sot,
                                                   init_sot_model)
    from stereotracking_tpu.data.sot import (Got10kDataset, LaSOTDataset,
                                             OTB100Dataset,
                                             SOTVideoDataset,
                                             TrackingNetDataset,
                                             UAV123Dataset, VOTDataset)
    from stereotracking_tpu.evaluation.sot_metrics import SOTMetric

    cls = {'got10k': Got10kDataset, 'lasot': LaSOTDataset,
           'trackingnet': TrackingNetDataset, 'otb100': OTB100Dataset,
           'uav123': UAV123Dataset, 'vot': VOTDataset,
           'generic': SOTVideoDataset}[args.dataset]
    ds = cls(args.data_root)

    variables = None
    if args.checkpoint:
        from stereotracking_tpu.train.checkpoint import load_checkpoint
        variables = load_checkpoint(args.checkpoint)
    model = init_sot_model(args.tracker, variables=variables,
                           rng_seed=args.seed)

    metric = SOTMetric()
    times = {}
    n_videos = len(ds) if args.max_videos <= 0 else min(
        len(ds), args.max_videos)
    rng = np.random.RandomState(args.seed)
    for vi in range(n_videos):
        info = ds.video_info(vi)
        name = (info.get('name') or getattr(ds, 'video_names', None)
                and ds.video_names[vi] or str(vi))
        frames = info['img_paths']
        gts = np.asarray(info['bboxes'], float)
        vis = np.asarray(info.get('visible',
                                  np.ones(len(frames), bool)), bool)
        if args.max_frames > 0:
            frames = frames[:args.max_frames]
            gts = gts[:args.max_frames]
            vis = vis[:args.max_frames]
        state = None
        per_frame_t = []
        for fi, path in enumerate(frames):
            img = np.asarray(PIL.Image.open(path).convert('RGB'),
                             np.float32)
            t0 = time.time()
            if fi == 0:
                state, out = inference_sot(model, img, init_bbox=gts[0])
            elif args.tracker == 'prdimp':
                state, (bb, sc) = model.track(img, state, rng)
                out = dict(bboxes=np.asarray(bb)[None],
                           scores=np.asarray([float(sc)]))
            else:
                state, out = inference_sot(model, img, state=state)
            per_frame_t.append(time.time() - t0)
            gt = gts[fi] if fi < len(gts) else gts[-1]
            metric.process_frame(name, out['bboxes'][0], gt,
                                 bool(vis[fi]) if fi < len(vis) else True)
        times[name] = per_frame_t
        print(f'[{vi + 1}/{n_videos}] {name}: {len(frames)} frames, '
              f'{len(frames) / max(sum(per_frame_t), 1e-9):.1f} fps',
              flush=True)

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    if args.dump == 'got10k':
        metric.save_formatted_results_got10k(args.out_dir, times)
        print(f'GOT10k submission written to {args.out_dir}')
        return
    if args.dump == 'trackingnet':
        metric.save_formatted_results_trackingnet(args.out_dir)
        print(f'TrackingNet submission written to {args.out_dir}')
        return

    results = {k: (v.tolist() if isinstance(v, np.ndarray) else float(v))
               for k, v in metric.evaluate().items()}
    print(json.dumps(results, indent=2))
    if args.out_dir:
        with open(os.path.join(args.out_dir, 'metrics.json'), 'w') as f:
            json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
