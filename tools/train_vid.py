"""Train a video object detector (Faster R-CNN core; plain or SELSA).

The VID analog of tools/train.py: COCO-VID frames with bilateral
ref-frame sampling (stereotracking_tpu.data.datasets.ref_img_sampling)
through the two-stage RPN+RCNN losses
(models/two_stage.faster_rcnn_train_step_fn). ``--selsa`` aggregates
key-proposal features against reference-frame proposals during the roi
stage (models/two_stage.SelsaBBoxHead)::

    python tools/train_vid.py --ann-file vid/annotations.json \
        --img-prefix vid/ --epochs 7 --steps-per-epoch 500 \
        --work-dir work_dirs/vid [--selsa]
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
    p = argparse.ArgumentParser(description='Train a VID detector')
    p.add_argument('--ann-file', required=True, help='COCO-VID json')
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--work-dir', default='work_dirs/vid')
    p.add_argument('--selsa', action='store_true')
    p.add_argument('--num-classes', type=int, default=30)
    p.add_argument('--epochs', type=int, default=7)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--base-lr', type=float, default=1e-3)
    p.add_argument('--max-gt', type=int, default=16)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--img-hw', type=int, nargs=2, default=None,
                   help='fixed train resolution (default: dataset size)')
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
    from stereotracking_tpu.data.datasets import ref_img_sampling
    from stereotracking_tpu.models.two_stage import (
        FasterRCNN, TwoStageConfig, faster_rcnn_train_step_fn,
        selsa_train_step_fn)
    from stereotracking_tpu.train.checkpoint import save_checkpoint

    coco = CocoVideo(os.path.join(args.data_root, args.ann_file))
    img_ids = coco.get_img_ids()
    cat2label = {c: i for i, c in enumerate(coco.cat_ids())}
    rng = np.random.RandomState(args.seed)

    first = coco.load_img(img_ids[0])
    h, w = args.img_hw or (first['height'], first['width'])

    cfg = TwoStageConfig(num_classes=args.num_classes)
    module = FasterRCNN(cfg, selsa=args.selsa)
    variables = module.init(jax.random.PRNGKey(args.seed),
                            jnp.zeros((1, h, w, 3)))
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    loss_fn = (selsa_train_step_fn(module, cfg) if args.selsa
               else faster_rcnn_train_step_fn(module, cfg))
    tx = optax.sgd(args.base_lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, rest, opt_state, batch, key):
        (total, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, rest, batch, key)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, {**rest, **updates}, opt_state, total, losses

    g = args.max_gt

    def load_sample():
        while True:
            img_id = int(rng.choice(img_ids))
            anns = coco.load_anns(img_id)
            if anns:
                break
        info = coco.load_img(img_id)
        path = os.path.join(args.data_root, args.img_prefix,
                            info['file_name'])
        im = PIL.Image.open(path).convert('RGB')
        sx, sy = w / im.width, h / im.height
        im = np.asarray(im.resize((w, h), PIL.Image.BILINEAR), np.float32)
        boxes = np.zeros((g, 4), np.float32)
        labels = np.zeros((g,), np.int32)
        valid = np.zeros((g,), bool)
        for i, a in enumerate(anns[:g]):
            x, y, bw, bh = a['bbox']
            boxes[i] = [x * sx, y * sy, (x + bw) * sx, (y + bh) * sy]
            labels[i] = cat2label[a['category_id']]
            valid[i] = True
        batch = dict(img=jnp.asarray(im)[None],
                     gt_bboxes=jnp.asarray(boxes),
                     gt_labels=jnp.asarray(labels),
                     gt_valid=jnp.asarray(valid))
        if args.selsa:
            # bilateral ref-frame sampling within the same video
            vid = info.get('video_id', -1)
            frames = coco.get_img_ids_from_vid(vid) if vid != -1 else []
            fid = info.get('frame_id', 0)
            refs = ref_img_sampling(fid, max(len(frames), 1), 9,
                                    num_ref_imgs=2, rng=rng) \
                if len(frames) > 2 else [fid, fid]
            while len(refs) < 2:
                refs = refs + [fid]
            ref_imgs = []
            for rf_id in refs[:2]:
                rinfo = coco.load_img(frames[rf_id]) if frames else info
                rpath = os.path.join(args.data_root, args.img_prefix,
                                     rinfo['file_name'])
                rim = PIL.Image.open(rpath).convert('RGB')
                ref_imgs.append(np.asarray(
                    rim.resize((w, h), PIL.Image.BILINEAR), np.float32))
            batch['ref_imgs'] = jnp.asarray(np.stack(ref_imgs))
        return batch

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            batch = load_sample()
            key = jax.random.PRNGKey(args.seed * 99991 + gstep)
            params, rest, opt_state, total, losses = step(
                params, rest, opt_state, batch, key)
            gstep += 1
            if it % 50 == 0:
                msg = ' '.join(f'{k}={float(x):.4f}'
                               for k, x in losses.items())
                print(f'[epoch {epoch} it {it}] total={float(total):.4f} '
                      f'{msg}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        save_checkpoint(os.path.join(args.work_dir,
                                     f'vid_e{epoch + 1}.ckpt'),
                        {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
