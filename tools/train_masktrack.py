"""Train MaskTrack R-CNN for video instance segmentation.

The VIS training analog of tools/train_qdtrack.py (reference
mmtrack/models/vis/masktrack_rcnn.py loss path): key/ref frame pairs
from a YouTube-VIS-format annotation file, Mask R-CNN detector losses +
per-instance 28x28 mask BCE + the track-head cross-entropy over
ref-frame instance matching (models/vis/masktrack_rcnn.
masktrack_train_loss_fn)::

    python tools/train_masktrack.py --ann-file ytvis/train.json \
        --img-prefix ytvis/train/JPEGImages --epochs 12
"""
import argparse
import os
import sys
import time

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='Train MaskTrack R-CNN')
    p.add_argument('--ann-file', required=True)
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--work-dir', default='work_dirs/masktrack')
    p.add_argument('--num-classes', type=int, default=40)
    p.add_argument('--epochs', type=int, default=12)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--base-lr', type=float, default=1e-3)
    p.add_argument('--img-hw', type=int, nargs=2, default=(384, 640))
    p.add_argument('--max-gts', type=int, default=16)
    p.add_argument('--num-rois', type=int, default=64)
    p.add_argument('--ref-range', type=int, default=3)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--ckpt-interval', type=int, default=4)
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import PIL.Image

    from stereotracking_tpu.data.youtube_vis import YouTubeVISDataset
    from stereotracking_tpu.models.two_stage import TwoStageConfig
    from stereotracking_tpu.models.vis.masktrack_rcnn import (
        MaskTrackRCNNModule, masktrack_train_loss_fn)
    from stereotracking_tpu.train.checkpoint import save_checkpoint

    ds = YouTubeVISDataset(os.path.join(args.data_root, args.ann_file))
    vids = [v for v in ds.videos() if len(ds.video_frames(v)) >= 2]
    assert vids, 'need videos with at least 2 frames'
    rng = np.random.RandomState(args.seed)
    h, w = args.img_hw
    g = args.max_gts

    cfg = TwoStageConfig(num_classes=args.num_classes,
                         anchor_scales=(8,), stride=4)
    model = MaskTrackRCNNModule(cfg)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, h, w, 3)))
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}
    loss_fn = masktrack_train_loss_fn(model, num_rois=args.num_rois)

    tx = optax.chain(optax.clip_by_global_norm(35.0),
                     optax.sgd(args.base_lr, momentum=0.9))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, rest, opt_state, batch, key):
        (total, (losses, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rest, batch, key)
        u, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, u), {**rest, **upd},
                opt_state, total, losses)

    def load_frame(img_id, with_masks):
        info = ds.frame_info(img_id)
        sx, sy = w / info['width'], h / info['height']
        path = os.path.join(args.data_root, args.img_prefix,
                            info['file_name'])
        img = np.asarray(PIL.Image.open(path).convert('RGB')
                         .resize((w, h), PIL.Image.BILINEAR), np.float32)
        boxes = np.zeros((g, 4), np.float32)
        boxes[:, 2:] = 1.0
        labels = np.zeros((g,), np.int32)
        ids = np.full((g,), -1, np.int32)
        valid = np.zeros((g,), bool)
        masks = np.zeros((g, h, w), np.float32) if with_masks else None
        for i in range(min(g, len(info['instance_ids']))):
            b = info['bboxes'][i]
            boxes[i] = [b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy]
            labels[i] = info['labels'][i]
            ids[i] = info['instance_ids'][i]
            valid[i] = True
            if with_masks and info['masks'][i] is not None:
                mm = PIL.Image.fromarray(
                    info['masks'][i].astype(np.uint8) * 255)
                masks[i] = np.asarray(
                    mm.resize((w, h), PIL.Image.BILINEAR)) > 127
        return img, boxes, labels, ids, valid, masks

    def load_pair():
        vid = int(rng.choice(vids))
        frames = ds.video_frames(vid)
        ki = int(rng.randint(len(frames)))
        lo = max(0, ki - args.ref_range)
        hi = min(len(frames) - 1, ki + args.ref_range)
        ri = int(rng.randint(lo, hi + 1))
        if ri == ki:
            ri = hi if ki == lo else lo
        ki_img, kb, kl, kid, kv, km = load_frame(frames[ki], True)
        ri_img, rb, _, rid, rv, _ = load_frame(frames[ri], False)
        return dict(
            img=jnp.asarray(ki_img)[None],
            ref_img=jnp.asarray(ri_img)[None],
            gt_bboxes=jnp.asarray(kb), gt_labels=jnp.asarray(kl),
            gt_ids=jnp.asarray(kid), gt_valid=jnp.asarray(kv),
            gt_masks=jnp.asarray(km),
            ref_gt_bboxes=jnp.asarray(rb), ref_gt_ids=jnp.asarray(rid),
            ref_gt_valid=jnp.asarray(rv))

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            batch = load_pair()
            params, rest, opt_state, total, losses = step(
                params, rest, opt_state, batch,
                jax.random.PRNGKey(args.seed * 99991 + gstep))
            gstep += 1
            if it % 50 == 0:
                msg = ' '.join(f'{k}={float(v):.4f}'
                               for k, v in sorted(losses.items()))
                print(f'[epoch {epoch} it {it}] total={float(total):.4f} '
                      f'{msg}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        if (epoch + 1) % args.ckpt_interval == 0 or epoch == args.epochs - 1:
            save_checkpoint(os.path.join(args.work_dir,
                                         f'masktrack_e{epoch + 1}.ckpt'),
                            {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
