"""Train the ReID embedding model (BaseReID) with cross-entropy +
triplet losses over a hard-mining triplet-sampled dataset.

The ReID analog of tools/train.py (reference: mmtrack ReID configs over
mot_challenge_reid data)::

    python tools/train_reid.py --ann-file reid/meta/train.txt \
        --data-prefix reid/imgs --epochs 10 --steps-per-epoch 200 \
        --work-dir work_dirs/reid
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
    p = argparse.ArgumentParser(description='Train ReID embeddings')
    p.add_argument('--ann-file', required=True,
                   help='lines of "<img_path> <person_id>"')
    p.add_argument('--data-prefix', default='')
    p.add_argument('--work-dir', default='work_dirs/reid')
    p.add_argument('--epochs', type=int, default=10)
    p.add_argument('--steps-per-epoch', type=int, default=200)
    p.add_argument('--num-ids', type=int, default=8)
    p.add_argument('--ins-per-id', type=int, default=4)
    p.add_argument('--base-lr', type=float, default=1e-3)
    p.add_argument('--embed-dim', type=int, default=256)
    p.add_argument('--widen-factor', type=float, default=0.5)
    p.add_argument('--img-hw', type=int, nargs=2, default=(256, 128))
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

    from stereotracking_tpu.data.reid import ReIDDataset, pack_reid_inputs
    from stereotracking_tpu.models.reid import BaseReID, reid_losses
    from stereotracking_tpu.train.checkpoint import save_checkpoint

    ds = ReIDDataset(args.ann_file, args.data_prefix)
    num_classes = len(ds.pids)
    rng = np.random.RandomState(args.seed)

    model = BaseReID(embed_dim=args.embed_dim, num_classes=num_classes,
                     widen_factor=args.widen_factor)
    h, w = args.img_hw
    dummy = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(args.seed), dummy,
                           train=True)
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    tx = optax.sgd(args.base_lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, rest, opt_state, imgs, labels):
        def loss_fn(p):
            (emb, logits), updates = model.apply(
                {'params': p, **rest}, imgs, train=True,
                mutable=['batch_stats'])
            d = reid_losses(emb, logits, labels)
            return d['loss'], (d, updates)

        (total, (d, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, {**rest, **updates}, opt_state, total, d

    def load_batch():
        anchor = int(rng.choice(ds.pids))
        info = ds.triplet_sampling(anchor, num_ids=args.num_ids,
                                   ins_per_id=args.ins_per_id, rng=rng)
        imgs = []
        for pth in info['img_path']:
            if os.path.exists(pth):
                im = np.asarray(
                    PIL.Image.open(pth).convert('RGB'), np.float32)
            else:                # fabricate when images are absent
                im = rng.rand(h, w, 3).astype(np.float32) * 255
            imgs.append(im)
        batch, labels = pack_reid_inputs(imgs, info['gt_label'],
                                         out_hw=(h, w))
        return jnp.asarray(batch), jnp.asarray(labels)

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            imgs, labels = load_batch()
            params, rest, opt_state, total, d = step(
                params, rest, opt_state, imgs, labels)
            gstep += 1
            if it % 50 == 0:
                print(f'[epoch {epoch} it {it}] loss={float(total):.4f} '
                      f'ce={float(d["loss_ce"]):.4f} '
                      f'triplet={float(d["loss_triplet"]):.4f}',
                      flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        save_checkpoint(os.path.join(args.work_dir,
                                     f'reid_e{epoch + 1}.ckpt'),
                        {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
