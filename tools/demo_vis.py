"""Video-instance-segmentation demo: stream MaskTrack R-CNN over a frame
directory and render per-instance masks with persistent ids.

The VIS analog of tools/demo_track.py (reference demo/demo_mot_vis.py)::

    python tools/demo_vis.py /path/to/frames --checkpoint masktrack.ckpt \
        --show-dir work_dirs/vis [--out-json work_dirs/tracks.json]
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
    p = argparse.ArgumentParser(description='VIS demo')
    p.add_argument('frames', help='directory of ordered frame images')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-classes', type=int, default=40)
    p.add_argument('--img-hw', type=int, nargs=2, default=(384, 640))
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--num-proposals', type=int, default=300)
    p.add_argument('--rpn-nms-pre', type=int, default=1024)
    p.add_argument('--rcnn-max-per-img', type=int, default=100)
    p.add_argument('--show-dir', default=None)
    p.add_argument('--out-json', default=None)
    p.add_argument('--seed', type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import PIL.Image

    from stereotracking_tpu.models.two_stage import TwoStageConfig
    from stereotracking_tpu.models.vis.masktrack_rcnn import (
        MaskTrackRCNNModule, MaskTrackRCNNStreaming)
    from stereotracking_tpu.visualization.visualizer import (
        TrackVisualizer, overlay_masks, paste_mask)

    paths = sorted(sum((glob.glob(os.path.join(args.frames, e))
                        for e in ('*.jpg', '*.png', '*.jpeg')), []))
    assert paths, f'no frames found in {args.frames}'

    h, w = args.img_hw
    cfg = TwoStageConfig(num_classes=args.num_classes,
                         anchor_scales=(8,), stride=4,
                         rpn_nms_pre=args.rpn_nms_pre,
                         num_proposals=args.num_proposals,
                         rcnn_max_per_img=args.rcnn_max_per_img)
    if args.checkpoint:
        from stereotracking_tpu.train.checkpoint import load_checkpoint
        variables = load_checkpoint(args.checkpoint)
    else:
        variables = MaskTrackRCNNModule(cfg).init(
            jax.random.PRNGKey(args.seed), jnp.zeros((1, h, w, 3)))
    model = MaskTrackRCNNStreaming(variables, cfg)

    vis = TrackVisualizer()
    if args.show_dir:
        os.makedirs(args.show_dir, exist_ok=True)

    dump = []
    for fi, path in enumerate(paths):
        im = PIL.Image.open(path).convert('RGB')
        sx, sy = im.width / w, im.height / h
        img = np.asarray(im.resize((w, h), PIL.Image.BILINEAR), np.float32)
        out = model.track(img[None], fi)
        valid = np.asarray(out['valid'])
        keep = np.flatnonzero(valid
                              & (np.asarray(out['scores']) >= args.score_thr))
        boxes = np.asarray(out['bboxes'])[keep] * [sx, sy, sx, sy]
        scores = np.asarray(out['scores'])[keep]
        labels = np.asarray(out['labels'])[keep]
        ids = np.asarray(out['instances_id'])[keep]
        mlogits = np.asarray(out['masks'])[keep]
        masks = np.stack([paste_mask(
            1 / (1 + np.exp(-mlogits[i, :, :, labels[i]])),
            boxes[i], im.height, im.width) for i in range(len(keep))]) \
            if len(keep) else np.zeros((0, im.height, im.width), bool)
        dump.append(dict(frame=os.path.basename(path),
                         bboxes=boxes.tolist(), scores=scores.tolist(),
                         labels=labels.tolist(),
                         instances_id=ids.tolist()))
        if args.show_dir:
            render = overlay_masks(np.asarray(im), masks, ids)
            render = vis.draw(render[:, :, ::-1], boxes, ids=ids,
                              scores=scores)
            PIL.Image.fromarray(render).save(
                os.path.join(args.show_dir, f'{fi:06d}.jpg'))
        print(f'[{fi + 1}/{len(paths)}] {os.path.basename(path)}: '
              f'{len(keep)} instances', flush=True)

    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or '.', exist_ok=True)
        with open(args.out_json, 'w') as f:
            json.dump(dump, f)
        print(f'wrote {args.out_json}')


if __name__ == '__main__':
    main()
