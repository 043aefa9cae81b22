"""Train Mask2Former for video instance segmentation.

The VIS analog of tools/train.py: YouTube-VIS-format clips
(data/youtube_vis.YouTubeVISDataset — polygon/RLE masks decoded without
pycocotools) through the masked-attention head and the Hungarian
CE+BCE+dice loss over all decoder layers
(models/vis/mask2former.mask2former_loss)::

    python tools/train_vis.py --ann-file ytvis/train.json \
        --img-prefix ytvis/train/JPEGImages --epochs 8 \
        --steps-per-epoch 500 --work-dir work_dirs/m2f
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
    p = argparse.ArgumentParser(description='Train Mask2Former VIS')
    p.add_argument('--ann-file', required=True)
    p.add_argument('--img-prefix', default='')
    p.add_argument('--data-root', default='')
    p.add_argument('--work-dir', default='work_dirs/m2f')
    p.add_argument('--num-classes', type=int, default=40)
    p.add_argument('--num-queries', type=int, default=100)
    p.add_argument('--clip-len', type=int, default=2)
    p.add_argument('--max-instances', type=int, default=8)
    p.add_argument('--epochs', type=int, default=8)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--base-lr', type=float, default=1e-4)
    p.add_argument('--img-hw', type=int, nargs=2, default=(192, 320))
    p.add_argument('--embed-dim', type=int, default=256)
    p.add_argument('--decoder-layers', type=int, default=9)
    p.add_argument('--seed', type=int, default=0)
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
    from stereotracking_tpu.models.vis.mask2former import (
        Mask2FormerConfig, Mask2FormerVIS, mask2former_loss)
    from stereotracking_tpu.train.checkpoint import save_checkpoint

    ds = YouTubeVISDataset(os.path.join(args.data_root, args.ann_file))
    videos = ds.videos()
    rng = np.random.RandomState(args.seed)
    h, w = args.img_hw
    t, g = args.clip_len, args.max_instances

    cfg = Mask2FormerConfig(num_classes=args.num_classes,
                            num_queries=args.num_queries,
                            embed_dim=args.embed_dim,
                            num_decoder_layers=args.decoder_layers)
    model = Mask2FormerVIS(cfg)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((t, h, w, 3)))
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    tx = optax.adamw(args.base_lr, weight_decay=5e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, rest, opt_state, imgs, gt_labels, gt_masks, gt_valid,
             key):
        def loss_fn(p):
            (cls_list, mask_list), updates = model.apply(
                {'params': p, **rest}, imgs, mutable=['batch_stats'])
            d = mask2former_loss(cls_list, mask_list, gt_labels, gt_masks,
                                 gt_valid, cfg, key=key)
            return sum(d.values()), (d, updates)

        (total, (d, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, {**rest, **updates}, opt_state, total, d

    mh, mw = h // 4, w // 4    # mask-feature stride 4

    def load_clip():
        while True:
            vid = int(rng.choice(videos))
            frames = ds.video_frames(vid)
            if len(frames) < t:
                continue
            start = int(rng.randint(0, len(frames) - t + 1))
            infos = [ds.frame_info(frames[start + k]) for k in range(t)]
            if any(len(i['instance_ids']) for i in infos):
                break
        imgs = []
        for info in infos:
            path = os.path.join(args.data_root, args.img_prefix,
                                info['file_name'])
            im = PIL.Image.open(path).convert('RGB')
            imgs.append(np.asarray(im.resize((w, h), PIL.Image.BILINEAR),
                                   np.float32))
        # collect instances across the clip by instance id
        all_ids = sorted({int(i) for info in infos
                          for i in info['instance_ids']})[:g]
        labels = np.zeros((g,), np.int32)
        masks = np.zeros((g, t, mh, mw), np.float32)
        valid = np.zeros((g,), bool)
        for gi, iid in enumerate(all_ids):
            valid[gi] = True
            for k, info in enumerate(infos):
                where = np.flatnonzero(info['instance_ids'] == iid)
                if len(where) == 0:
                    continue
                j = int(where[0])
                labels[gi] = info['labels'][j]
                m = info['masks'][j]
                if m is None:
                    continue
                mm = PIL.Image.fromarray(m.astype(np.uint8) * 255)
                masks[gi, k] = np.asarray(
                    mm.resize((mw, mh), PIL.Image.BILINEAR)) > 127
        return (jnp.asarray(np.stack(imgs)), jnp.asarray(labels),
                jnp.asarray(masks), jnp.asarray(valid))

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            imgs, labels, masks, valid = load_clip()
            params, rest, opt_state, total, d = step(
                params, rest, opt_state, imgs, labels, masks, valid,
                jax.random.PRNGKey(gstep))
            gstep += 1
            if it % 50 == 0:
                print(f'[epoch {epoch} it {it}] total={float(total):.4f} '
                      f'cls={float(d["loss_cls"]):.4f} '
                      f'mask={float(d["loss_mask"]):.4f} '
                      f'dice={float(d["loss_dice"]):.4f}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        save_checkpoint(os.path.join(args.work_dir,
                                     f'm2f_e{epoch + 1}.ckpt'),
                        {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
