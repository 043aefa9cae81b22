"""Evaluate video instance segmentation with mask-track AP.

The VIS analog of tools/test.py (reference tools/test.py +
``YouTubeVISMetric``, mmtrack/evaluation/metrics/youtube_vis_metrics.py):

* ``--model mask2former`` runs the whole clip through Mask2FormerVIS
  (query index = instance id across the video);
* ``--model masktrack`` streams frames through MaskTrackRCNNStreaming
  (per-detection 28x28 mask logits pasted into full-frame masks).

Both accumulate per-video tracks into the YTVIS mask-track AP metric::

    python tools/test_vis.py --ann-file ytvis/valid.json \
        --img-prefix ytvis/valid/JPEGImages --model mask2former \
        --checkpoint work_dirs/m2f/m2f_e8.ckpt
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
    p = argparse.ArgumentParser(description='VIS track-AP evaluation')
    p.add_argument('--ann-file', required=True)
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--model', default='mask2former',
                   choices=['mask2former', 'masktrack'])
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-classes', type=int, default=40)
    p.add_argument('--img-hw', type=int, nargs=2, default=(192, 320))
    p.add_argument('--score-thr', type=float, default=0.05)
    p.add_argument('--num-proposals', type=int, default=300,
                   help='masktrack RPN proposals (reduce for smoke runs)')
    p.add_argument('--rpn-nms-pre', type=int, default=1024)
    p.add_argument('--rcnn-max-per-img', type=int, default=100)
    p.add_argument('--out', default=None, help='metrics.json path')
    p.add_argument('--max-videos', type=int, default=0)
    p.add_argument('--max-frames', type=int, default=0)
    p.add_argument('--seed', type=int, default=0)
    # mask2former smoke knobs (canonical 256/9/6 compiles are slow on CPU)
    p.add_argument('--embed-dim', type=int, default=256)
    p.add_argument('--decoder-layers', type=int, default=9)
    p.add_argument('--pixel-decoder-layers', type=int, default=6)
    p.add_argument('--num-queries', type=int, default=100)
    p.add_argument('--num-heads', type=int, default=8)
    p.add_argument('--ffn-dim', type=int, default=None,
                   help='decoder FFN width (default: 8 * embed-dim)')
    return p.parse_args()


def paste_mask(mask28, box, height, width):
    """Paste a 28x28 mask probability patch into an HxW bool mask
    (mmdet _do_paste_mask semantics, bilinear into the box extent)."""
    import numpy as np
    import PIL.Image

    x1, y1, x2, y2 = [int(round(float(v))) for v in box]
    x1, y1 = max(x1, 0), max(y1, 0)
    x2, y2 = min(max(x2, x1 + 1), width), min(max(y2, y1 + 1), height)
    patch = PIL.Image.fromarray((np.asarray(mask28, np.float32) * 255)
                                .astype(np.uint8))
    patch = patch.resize((x2 - x1, y2 - y1), PIL.Image.BILINEAR)
    out = np.zeros((height, width), bool)
    out[y1:y2, x1:x2] = np.asarray(patch) > 127
    return out


def main():
    args = parse_args()

    import jax
    import numpy as np
    import PIL.Image

    from stereotracking_tpu.data.youtube_vis import YouTubeVISDataset
    from stereotracking_tpu.evaluation.track_ap import YTVISMetric

    ds = YouTubeVISDataset(os.path.join(args.data_root, args.ann_file))
    h, w = args.img_hw
    metric = YTVISMetric()

    variables = None
    if args.checkpoint:
        if args.checkpoint.endswith(('.pth', '.pt')):
            # reference torch checkpoint: convert on load
            # (apis/inference.py init_model pattern)
            from stereotracking_tpu.utils import torch_convert as TC
            if args.model == 'mask2former':
                variables = TC.convert_zoo_checkpoint(
                    args.checkpoint, 'mask2former', heads=args.num_heads)
            else:
                variables = TC.convert_zoo_checkpoint(
                    args.checkpoint, 'masktrack')
        else:
            from stereotracking_tpu.train.checkpoint import load_checkpoint
            variables = load_checkpoint(args.checkpoint)

    if args.model == 'mask2former':
        import jax.numpy as jnp
        from stereotracking_tpu.models.vis.mask2former import (
            Mask2FormerConfig, Mask2FormerVIS, mask2former_predict)
        cfg = Mask2FormerConfig(
            num_classes=args.num_classes, embed_dim=args.embed_dim,
            num_heads=args.num_heads,
            ffn_dim=args.ffn_dim or args.embed_dim * 8,
            num_decoder_layers=args.decoder_layers,
            pixel_decoder_layers=args.pixel_decoder_layers,
            num_queries=args.num_queries)
        model = Mask2FormerVIS(cfg)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(args.seed),
                                   jnp.zeros((1, h, w, 3)))
        fwd = jax.jit(lambda v, x: model.apply(v, x))
    else:
        import jax.numpy as jnp
        from stereotracking_tpu.models.two_stage import TwoStageConfig
        from stereotracking_tpu.models.vis.masktrack_rcnn import (
            MaskTrackRCNNModule, MaskTrackRCNNStreaming)
        cfg = TwoStageConfig(num_classes=args.num_classes,
                             anchor_scales=(8,), stride=4,
                             rpn_nms_pre=args.rpn_nms_pre,
                             num_proposals=args.num_proposals,
                             rcnn_max_per_img=args.rcnn_max_per_img)
        if variables is None:
            variables = MaskTrackRCNNModule(cfg).init(
                jax.random.PRNGKey(args.seed), jnp.zeros((1, h, w, 3)))
        model = MaskTrackRCNNStreaming(variables, cfg)

    vids = ds.videos()
    if args.max_videos > 0:
        vids = vids[:args.max_videos]
    for vi, vid in enumerate(vids):
        frame_ids = ds.video_frames(vid)
        if args.max_frames > 0:
            frame_ids = frame_ids[:args.max_frames]
        infos = [ds.frame_info(f) for f in frame_ids]
        oh, ow = infos[0]['height'], infos[0]['width']
        imgs = []
        for info in infos:
            path = os.path.join(args.data_root, args.img_prefix,
                                info['file_name'])
            im = PIL.Image.open(path).convert('RGB')
            imgs.append(np.asarray(im.resize((w, h), PIL.Image.BILINEAR),
                                   np.float32))

        # ---- predicted tracks: instance id -> {frame: full-size mask}
        pred = {}
        if args.model == 'mask2former':
            cls_list, mask_list = fwd(variables, np.stack(imgs))
            res = mask2former_predict(cls_list[-1], mask_list[-1], cfg)
            scores = np.asarray(res['scores'])
            labels = np.asarray(res['labels'])
            masks = np.asarray(res['masks'])          # (P, T, h/4, w/4)
            for pi in range(len(scores)):
                if scores[pi] < args.score_thr:
                    continue
                track = {}
                for ti in range(masks.shape[1]):
                    m = PIL.Image.fromarray(
                        masks[pi, ti].astype(np.uint8) * 255)
                    track[ti] = np.asarray(
                        m.resize((ow, oh), PIL.Image.NEAREST)) > 127
                pred[pi] = (float(scores[pi]), int(labels[pi]), track)
        else:
            acc = {}
            sx, sy = ow / w, oh / h
            for ti, img in enumerate(imgs):
                out = model.track(img[None], ti)
                valid = np.asarray(out['valid'])
                boxes = np.asarray(out['bboxes'])
                labels = np.asarray(out['labels'])
                scores = np.asarray(out['scores'])
                mlogits = np.asarray(out['masks'])    # (R, 28, 28, C)
                ids = np.asarray(out['instances_id'])
                for ri in np.flatnonzero(valid):
                    if scores[ri] < args.score_thr:
                        continue
                    box = boxes[ri] * [sx, sy, sx, sy]
                    prob = 1 / (1 + np.exp(-mlogits[ri, :, :, labels[ri]]))
                    full = paste_mask(prob, box, oh, ow)
                    sc, lb, track = acc.setdefault(
                        int(ids[ri]), (0.0, int(labels[ri]), {}))
                    track[ti] = full
                    acc[int(ids[ri])] = (max(sc, float(scores[ri])), lb,
                                         track)
            pred = acc

        for iid, (score, label, track) in pred.items():
            metric.add_pred_track(str(vid), label, score, track)

        # ---- GT tracks
        gt = {}
        for ti, info in enumerate(infos):
            for gi, iid in enumerate(info['instance_ids']):
                m = info['masks'][gi]
                if m is None:
                    continue
                _, track = gt.setdefault(int(iid),
                                         (int(info['labels'][gi]), {}))
                track[ti] = m.astype(bool)
        for iid, (label, track) in gt.items():
            metric.add_gt_track(str(vid), label, track)
        print(f'[{vi + 1}/{len(vids)}] video {vid}: {len(frame_ids)} '
              f'frames, {len(pred)} pred tracks', flush=True)

    results = metric.evaluate()
    print(json.dumps(results, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()
