"""Video-object-detection demo: run DFF / FGFA / SELSA over a frame
directory and dump per-frame detections (and optional renders).

The VID analog of tools/demo_track.py (reference demo/demo_vid.py)::

    python tools/demo_vid.py /path/to/frames --method selsa \
        --checkpoint selsa.ckpt --out-json work_dirs/dets.json \
        [--show-dir work_dirs/vis]
"""
import argparse
import glob
import json
import os
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='VID demo')
    p.add_argument('frames', help='directory of ordered frame images')
    p.add_argument('--method', default='selsa',
                   choices=['dff', 'fgfa', 'selsa'])
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-classes', type=int, default=30)
    p.add_argument('--img-hw', type=int, nargs=2, default=(384, 512))
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--out-json', default=None,
                   help='per-frame detections (xyxy, score, label)')
    p.add_argument('--show-dir', default=None,
                   help='render detections every frame')
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    import numpy as np
    import PIL.Image

    from stereotracking_tpu.apis.inference import (inference_vid,
                                                   init_vid_model)
    from stereotracking_tpu.models.two_stage import TwoStageConfig
    from stereotracking_tpu.visualization.visualizer import TrackVisualizer

    paths = sorted(sum((glob.glob(os.path.join(args.frames, e))
                        for e in ('*.jpg', '*.png', '*.jpeg')), []))
    assert paths, f'no frames found in {args.frames}'

    cfg = TwoStageConfig(num_classes=args.num_classes)
    variables = None
    if args.checkpoint:
        from stereotracking_tpu.train.checkpoint import load_checkpoint
        variables = load_checkpoint(args.checkpoint)
    model = init_vid_model(args.method, variables=variables, cfg=cfg,
                           img_hw=tuple(args.img_hw), rng_seed=args.seed)

    vis = TrackVisualizer() if args.show_dir else None
    if args.show_dir:
        os.makedirs(args.show_dir, exist_ok=True)

    h, w = args.img_hw
    state = None
    dump = []
    for fi, path in enumerate(paths):
        im = PIL.Image.open(path).convert('RGB')
        sx, sy = w / im.width, h / im.height
        img = np.asarray(im.resize((w, h), PIL.Image.BILINEAR), np.float32)
        state, out = inference_vid(model, img, fi, state)
        keep = out['scores'] >= args.score_thr
        boxes = out['bboxes'][keep] / [sx, sy, sx, sy]
        scores = out['scores'][keep]
        labels = out['labels'][keep]
        dump.append(dict(frame=os.path.basename(path),
                         bboxes=boxes.tolist(), scores=scores.tolist(),
                         labels=labels.tolist()))
        if vis is not None:
            frame_bgr = np.asarray(im)[:, :, ::-1]
            render = vis.draw(frame_bgr, boxes, scores=scores,
                              labels=labels)
            PIL.Image.fromarray(render).save(
                os.path.join(args.show_dir, f'{fi:06d}.jpg'))
        print(f'[{fi + 1}/{len(paths)}] {os.path.basename(path)}: '
              f'{int(keep.sum())} detections', flush=True)

    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or '.', exist_ok=True)
        with open(args.out_json, 'w') as f:
            json.dump(dump, f)
        print(f'wrote {args.out_json}')


if __name__ == '__main__':
    main()
