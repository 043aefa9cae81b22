"""Train QDTrack (quasi-dense similarity learning for MOT).

The MOT-extras analog of tools/train.py (reference
mmtrack/models/mot/qdtrack.py loss path): key/ref frame pairs from a
CocoVID annotation file, detector RPN+RCNN losses on the key frame and
the quasi-dense embedding losses (MultiPosCrossEntropy + cosine aux)
over proposals of both frames matched by instance id, SGD with the
reference's gradient clipping::

    python tools/train_qdtrack.py --ann-file mot/train.json \
        --img-prefix mot/ --epochs 12 --steps-per-epoch 500
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
    p = argparse.ArgumentParser(description='Train QDTrack')
    p.add_argument('--ann-file', required=True)
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--work-dir', default='work_dirs/qdtrack')
    p.add_argument('--num-classes', type=int, default=1)
    p.add_argument('--epochs', type=int, default=12)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--base-lr', type=float, default=2e-3)
    p.add_argument('--img-hw', type=int, nargs=2, default=(384, 512))
    p.add_argument('--max-gts', type=int, default=32)
    p.add_argument('--num-rois', type=int, default=64)
    p.add_argument('--ref-range', type=int, default=3,
                   help='ref frame sampled within +-range of the key')
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

    from stereotracking_tpu.data.coco_video import CocoVideo
    from stereotracking_tpu.models.qdtrack import (QDTrackModule,
                                                   qdtrack_train_loss_fn)
    from stereotracking_tpu.train.checkpoint import save_checkpoint

    coco = CocoVideo(os.path.join(args.data_root, args.ann_file))
    cat2label = {c: i for i, c in enumerate(coco.cat_ids())}
    vids = [v for v in coco.get_vid_ids()
            if len(coco.get_img_ids_from_vid(v)) >= 2]
    assert vids, 'need videos with at least 2 frames'
    rng = np.random.RandomState(args.seed)
    h, w = args.img_hw
    g = args.max_gts

    model = QDTrackModule(num_classes=args.num_classes)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, h, w, 3)))
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}
    loss_fn = qdtrack_train_loss_fn(model, num_rois=args.num_rois)

    # reference optim_wrapper: SGD momentum 0.9, grad clip max_norm 35
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

    def load_frame(img_id, sx, sy):
        info = coco.load_img(img_id)
        path = os.path.join(args.data_root, args.img_prefix,
                            info['file_name'])
        img = np.asarray(PIL.Image.open(path).convert('RGB')
                         .resize((w, h), PIL.Image.BILINEAR), np.float32)
        boxes = np.zeros((g, 4), np.float32)
        boxes[:, 2:] = 1.0
        labels = np.zeros((g,), np.int32)
        ids = np.full((g,), -1, np.int32)
        valid = np.zeros((g,), bool)
        for i, a in enumerate(coco.load_anns(img_id)[:g]):
            x, y, bw, bh = a['bbox']
            boxes[i] = [x * sx, y * sy, (x + bw) * sx, (y + bh) * sy]
            labels[i] = cat2label[a['category_id']]
            ids[i] = a.get('instance_id', a.get('id', -1))
            valid[i] = not a.get('iscrowd', 0)
        return img, boxes, labels, ids, valid

    def load_pair():
        vid = int(rng.choice(vids))
        frames = coco.get_img_ids_from_vid(vid)
        ki = int(rng.randint(len(frames)))
        lo = max(0, ki - args.ref_range)
        hi = min(len(frames) - 1, ki + args.ref_range)
        ri = ki
        while ri == ki:
            ri = int(rng.randint(lo, hi + 1)) if hi > lo else ki
            if hi == lo:
                break
        info = coco.load_img(frames[ki])
        sx, sy = w / info['width'], h / info['height']
        ki_img, kb, kl, kid, kv = load_frame(frames[ki], sx, sy)
        ri_img, rb, _, rid, rv = load_frame(frames[ri], sx, sy)
        return dict(
            img=jnp.asarray(ki_img)[None], ref_img=jnp.asarray(ri_img)[None],
            gt_bboxes=jnp.asarray(kb), gt_labels=jnp.asarray(kl),
            gt_ids=jnp.asarray(kid), gt_valid=jnp.asarray(kv),
            ref_gt_bboxes=jnp.asarray(rb), ref_gt_ids=jnp.asarray(rid),
            ref_gt_valid=jnp.asarray(rv))

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            batch = load_pair()
            params, rest, opt_state, total, losses = step(
                params, rest, opt_state, batch,
                jax.random.PRNGKey(args.seed * 100003 + gstep))
            gstep += 1
            if it % 50 == 0:
                msg = ' '.join(f'{k}={float(v):.4f}'
                               for k, v in sorted(losses.items()))
                print(f'[epoch {epoch} it {it}] total={float(total):.4f} '
                      f'{msg}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        if (epoch + 1) % args.ckpt_interval == 0 or epoch == args.epochs - 1:
            save_checkpoint(os.path.join(args.work_dir,
                                         f'qdtrack_e{epoch + 1}.ckpt'),
                            {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
