"""Train a Stark single-object tracker (stage 1: box regression;
stage 2: confidence head).

Trident-sampled template/search frames (data/sot.trident_sampling),
jittered zero-padded crops with attention masks (crop_like_stark +
seq_bbox_jitter), through the Stark transformer head and the stage
losses (models/sot/stark.stark_stage1_loss / stark_stage2_loss). Stage 2
freezes everything but the score head (the reference's two-stage ST1/ST2
protocol)::

    python tools/train_stark.py --data-root got10k/train --dataset got10k \
        --stage 1 --epochs 50 --steps-per-epoch 500 --work-dir work_dirs/stark
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
    p = argparse.ArgumentParser(description='Train Stark')
    p.add_argument('--data-root', required=True)
    p.add_argument('--dataset', default='got10k',
                   choices=['got10k', 'lasot', 'trackingnet', 'generic'])
    p.add_argument('--stage', type=int, default=1, choices=[1, 2])
    p.add_argument('--init-ckpt', default=None,
                   help='stage-1 checkpoint to start stage 2 from')
    p.add_argument('--work-dir', default='work_dirs/stark')
    p.add_argument('--epochs', type=int, default=50)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--template-size', type=int, default=128)
    p.add_argument('--search-size', type=int, default=320)
    p.add_argument('--base-lr', type=float, default=1e-4)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--ckpt-interval', type=int, default=10)
    return p.parse_args()


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    import PIL.Image

    from stereotracking_tpu.data.sot import (Got10kDataset, LaSOTDataset,
                                             SOTVideoDataset,
                                             TrackingNetDataset,
                                             check_pad_mask_validity,
                                             crop_like_stark,
                                             seq_bbox_jitter,
                                             trident_sampling)
    from stereotracking_tpu.models.sot.stark import (StarkModule,
                                                     StarkTestCfg,
                                                     stark_stage1_loss,
                                                     stark_stage2_loss)
    from stereotracking_tpu.train.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    cls = {'got10k': Got10kDataset, 'lasot': LaSOTDataset,
           'trackingnet': TrackingNetDataset,
           'generic': SOTVideoDataset}[args.dataset]
    ds = cls(args.data_root)
    rng = np.random.RandomState(args.seed)

    cfg = StarkTestCfg(template_size=args.template_size,
                       search_size=args.search_size)
    module = StarkModule(cfg)
    z0 = jnp.zeros((1, cfg.template_size, cfg.template_size, 3))
    zm0 = jnp.zeros((1, cfg.template_size, cfg.template_size))
    x0 = jnp.zeros((1, cfg.search_size, cfg.search_size, 3))
    xm0 = jnp.zeros((1, cfg.search_size, cfg.search_size))
    variables = module.init(jax.random.PRNGKey(args.seed),
                            [z0, z0], [zm0, zm0], x0, xm0)
    if args.init_ckpt:
        variables = load_checkpoint(args.init_ckpt, variables)
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    tx = optax.adamw(args.base_lr, weight_decay=1e-4)
    opt_state = tx.init(params)

    stage2 = args.stage == 2

    def freeze_mask(tree, prefix=()):
        """Stage 2 trains only the score head."""
        if isinstance(tree, dict):
            return {k: freeze_mask(v, prefix + (k,)) for k, v in
                    tree.items()}
        frozen = stage2 and not (len(prefix) > 1 and prefix[0] == 'head'
                                 and str(prefix[1]).startswith('cls_head'))
        return frozen

    freeze = freeze_mask(params)

    @jax.jit
    def step(params, rest, opt_state, zs, zms, xs, xms, gt, label):
        def loss_fn(p):
            (logits, bboxes), updates = module.apply(
                {'params': p, **rest}, [zs[:, 0], zs[:, 1]],
                [zms[:, 0], zms[:, 1]], xs, xms, train=True,
                mutable=['batch_stats'])
            if stage2:
                d = stark_stage2_loss(logits, label)
            else:
                d = stark_stage1_loss(bboxes, gt, cfg.search_size)
            return sum(d.values()), (d, updates)

        (total, (d, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g, f: jnp.where(f, 0.0, g), grads,
                             freeze)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, {**rest, **updates}, opt_state, total, d

    def load_pair():
        while True:
            vi = ds.video_info(int(rng.randint(len(ds))))
            s = trident_sampling(vi, num_template_frames=2,
                                 num_search_frames=1, rng=rng)
            if s is None:
                continue
            inds = s['template_inds'] + s['search_inds']
            imgs = [np.asarray(PIL.Image.open(
                vi['img_paths'][i]).convert('RGB'), np.float32)
                for i in inds]
            gts = [vi['bboxes'][i] for i in inds]
            jit = seq_bbox_jitter(gts, [0, 0.25, 0.5], [0, 3.0, 4.5],
                                  [2.0, 2.0, 5.0], rng)
            if jit is None:
                continue
            crops, masks = [], []
            for k in range(3):
                factor = 2.0 if k < 2 else 5.0
                size = cfg.template_size if k < 2 else cfg.search_size
                c, m, b = crop_like_stark(imgs[k], jit[k], gts[k],
                                          factor, size)
                crops.append(c)
                masks.append(m)
                if k == 2:
                    gt_search = b
            if not check_pad_mask_validity(masks, stride=16):
                continue
            return crops, masks, gt_search

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            crops, masks, gt = load_pair()
            zs = jnp.asarray(np.stack(crops[:2]))[None]     # (1, 2, S, S, 3)
            zms = jnp.asarray(np.stack(masks[:2]))[None]
            xs = jnp.asarray(crops[2])[None]
            xms = jnp.asarray(masks[2])[None]
            gtb = jnp.asarray(gt, jnp.float32)[None]
            label = jnp.ones((1,), jnp.float32)   # trident pairs: positive
            params, rest, opt_state, total, d = step(
                params, rest, opt_state, zs, zms, xs, xms, gtb, label)
            gstep += 1
            if it % 50 == 0:
                msg = ' '.join(f'{k}={float(x):.4f}' for k, x in d.items())
                print(f'[s{args.stage} e{epoch} it {it}] '
                      f'total={float(total):.4f} {msg}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        if (epoch + 1) % args.ckpt_interval == 0 or epoch == args.epochs - 1:
            save_checkpoint(os.path.join(
                args.work_dir, f'stark_s{args.stage}_e{epoch + 1}.ckpt'),
                {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
