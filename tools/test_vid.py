"""Evaluate a video object detector (DFF / FGFA / SELSA) with COCO mAP.

The VID analog of tools/test.py (reference tools/test.py +
``CocoVideoMetric``, mmtrack/evaluation/metrics/coco_video_metric.py):
stream every video frame-by-frame through ``inference_vid`` and score
bbox mAP against the CocoVID annotations::

    python tools/test_vid.py --ann-file vid/val.json --img-prefix vid/ \
        --method selsa --checkpoint work_dirs/selsa/selsa_e7.ckpt
"""
import argparse
import json
import os
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='VID COCO-mAP evaluation')
    p.add_argument('--ann-file', required=True)
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--method', default='selsa',
                   choices=['dff', 'fgfa', 'selsa'])
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-classes', type=int, default=30)
    p.add_argument('--img-hw', type=int, nargs=2, default=(384, 512))
    p.add_argument('--score-thr', type=float, default=0.05)
    p.add_argument('--out', default=None, help='metrics.json path')
    p.add_argument('--max-videos', type=int, default=0)
    p.add_argument('--max-frames', type=int, default=0)
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    import numpy as np
    import PIL.Image

    from stereotracking_tpu.apis.inference import (inference_vid,
                                                   init_vid_model)
    from stereotracking_tpu.data.coco_video import CocoVideo
    from stereotracking_tpu.evaluation.coco_metric import CocoMAPEvaluator
    from stereotracking_tpu.models.two_stage import TwoStageConfig

    coco = CocoVideo(os.path.join(args.data_root, args.ann_file))
    cat2label = {c: i for i, c in enumerate(coco.cat_ids())}

    cfg = TwoStageConfig(num_classes=args.num_classes)
    variables = None
    if args.checkpoint:
        from stereotracking_tpu.train.checkpoint import load_checkpoint
        variables = load_checkpoint(args.checkpoint)
    model = init_vid_model(args.method, variables=variables, cfg=cfg,
                           img_hw=tuple(args.img_hw), rng_seed=args.seed)

    h, w = args.img_hw
    metric = CocoMAPEvaluator(num_classes=args.num_classes)
    vids = coco.get_vid_ids()
    if args.max_videos > 0:
        vids = vids[:args.max_videos]
    for vi, vid in enumerate(vids):
        img_ids = coco.get_img_ids_from_vid(vid)
        if args.max_frames > 0:
            img_ids = img_ids[:args.max_frames]
        state = None
        for fi, img_id in enumerate(img_ids):
            info = coco.load_img(img_id)
            path = os.path.join(args.data_root, args.img_prefix,
                                info['file_name'])
            im = PIL.Image.open(path).convert('RGB')
            sx, sy = w / im.width, h / im.height
            img = np.asarray(im.resize((w, h), PIL.Image.BILINEAR),
                             np.float32)
            state, out = inference_vid(model, img, fi, state)
            keep = out['scores'] >= args.score_thr
            boxes = out['bboxes'][keep] / [sx, sy, sx, sy]
            metric.add_dt(img_id, boxes, out['scores'][keep],
                          out['labels'][keep])
            gts, glabels, gignore = [], [], []
            for a in coco.load_anns(img_id):
                x, y, bw, bh = a['bbox']
                gts.append([x, y, x + bw, y + bh])
                glabels.append(cat2label[a['category_id']])
                gignore.append(bool(a.get('ignore', 0)
                                    or a.get('iscrowd', 0)))
            metric.add_gt(img_id, gts, glabels, ignore=gignore)
        print(f'[{vi + 1}/{len(vids)}] video {vid}: '
              f'{len(img_ids)} frames', flush=True)

    results = metric.evaluate()
    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
