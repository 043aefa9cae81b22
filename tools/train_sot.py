"""Train a SiamRPN++ single-object tracker.

The SOT analog of tools/train.py: pair-sampled template/search crops from
GOT10k/LaSOT/TrackingNet-layout videos (stereotracking_tpu.data.sot)
through the fixed-shape SiamRPN target sampling + CE/L1 losses
(models/sot/siamrpn_loss.py), SGD with the SiamRPN exponential warm ramp
(train/schedules.siamrpn_exp_schedule) and optimizer-masked backbone
freezing/unfreezing (data/sot.siamrpn_unfreeze_prefixes).

Usage::

    python tools/train_sot.py --data-root /path/to/got10k/train \
        --dataset got10k --epochs 20 --steps-per-epoch 500 \
        --work-dir work_dirs/siamrpn
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
    p = argparse.ArgumentParser(description='Train SiamRPN++')
    p.add_argument('--data-root', required=True)
    p.add_argument('--dataset', default='got10k',
                   choices=['got10k', 'lasot', 'trackingnet', 'generic',
                            'sot_coco', 'sot_imagenet_vid'])
    p.add_argument('--ann-file', default=None,
                   help='COCO/CocoVID json for the sot_coco / '
                        'sot_imagenet_vid wrappers')
    p.add_argument('--work-dir', default='work_dirs/siamrpn')
    p.add_argument('--epochs', type=int, default=20)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--batch-size', type=int, default=8)
    p.add_argument('--base-lr', type=float, default=5e-3)
    p.add_argument('--exemplar-size', type=int, default=127)
    p.add_argument('--search-size', type=int, default=255)
    p.add_argument('--unfreeze-epoch', type=int, default=10)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--ckpt-interval', type=int, default=5)
    return p.parse_args()


def build_dataset(args):
    from stereotracking_tpu.data.sot import (Got10kDataset, LaSOTDataset,
                                             SOTCocoDataset,
                                             SOTImageNetVIDDataset,
                                             SOTVideoDataset,
                                             TrackingNetDataset)
    if args.dataset in ('sot_coco', 'sot_imagenet_vid'):
        cls = (SOTCocoDataset if args.dataset == 'sot_coco'
               else SOTImageNetVIDDataset)
        return cls(args.ann_file, img_prefix=args.data_root)
    cls = {'got10k': Got10kDataset, 'lasot': LaSOTDataset,
           'trackingnet': TrackingNetDataset,
           'generic': SOTVideoDataset}[args.dataset]
    return cls(args.data_root)


def make_batch(ds, args, rng, feat_size):
    """Sample a batch of (template, search, gt-in-search, is_positive)."""
    import numpy as np
    import PIL.Image

    from stereotracking_tpu.data.sot import (crop_image, crop_like_siamfc,
                                             pair_sampling,
                                             siamfc_generated_box)

    z_list, x_list, gt_list, pos_list = [], [], [], []
    while len(z_list) < args.batch_size:
        vi = ds.video_info(int(rng.randint(len(ds))))
        vj = ds.video_info(int(rng.randint(len(ds))))
        pair = pair_sampling(vi, vj, frame_range=5, pos_prob=0.8, rng=rng)
        (tv, ti), (sv, si) = pair['template'], pair['search']
        if not tv['bboxes_isvalid'][ti] or not sv['bboxes_isvalid'][si]:
            continue
        t_img = np.asarray(PIL.Image.open(tv['img_paths'][ti]).convert('RGB'),
                           np.float32)
        s_img = np.asarray(PIL.Image.open(sv['img_paths'][si]).convert('RGB'),
                           np.float32)
        z = crop_like_siamfc(t_img, tv['bboxes'][ti],
                             exemplar_size=args.exemplar_size,
                             crop_size=args.exemplar_size)
        x = crop_like_siamfc(s_img, sv['bboxes'][si],
                             exemplar_size=args.exemplar_size,
                             crop_size=args.search_size)
        gt = siamfc_generated_box((args.search_size, args.search_size),
                                  sv['bboxes'][si],
                                  exemplar_size=args.exemplar_size)
        z_list.append(z)
        x_list.append(x)
        gt_list.append(gt)
        pos_list.append(1 if pair['is_positive'] else 0)
    return (np.stack(z_list).astype(np.float32),
            np.stack(x_list).astype(np.float32),
            np.stack(gt_list).astype(np.float32),
            np.asarray(pos_list, np.int32))


def main():
    args = parse_args()
    os.makedirs(args.work_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from stereotracking_tpu.data.sot import siamrpn_unfreeze_prefixes
    from stereotracking_tpu.models.sot import (SiamRPNModule,
                                               SiamRPNTrainCfg, siamrpn_loss)
    from stereotracking_tpu.models.sot.siamrpn import _sot_backbone_size
    from stereotracking_tpu.train.checkpoint import save_checkpoint
    from stereotracking_tpu.train.schedules import siamrpn_exp_schedule

    ds = build_dataset(args)
    rng = np.random.RandomState(args.seed)
    feat = _sot_backbone_size(args.search_size) - 7 + 1
    tcfg = SiamRPNTrainCfg(search_size=args.search_size,
                           exemplar_size=args.exemplar_size,
                           feat_size=feat)

    module = SiamRPNModule(center_size=7)
    z0 = jnp.zeros((1, args.exemplar_size, args.exemplar_size, 3))
    x0 = jnp.zeros((1, args.search_size, args.search_size, 3))
    variables = module.init(jax.random.PRNGKey(args.seed), z0, x0)
    params, rest = variables['params'], {
        k: v for k, v in variables.items() if k != 'params'}

    schedule = siamrpn_exp_schedule(args.base_lr, args.steps_per_epoch,
                                    args.epochs)
    tx = optax.sgd(schedule, momentum=0.9)
    opt_state = tx.init(params)

    def frozen_mask(params, prefixes):
        """True-leaved subtree for parameters under a frozen backbone
        module (gradients zeroed -> requires_grad=False analog)."""
        def walk(tree, prefix=()):
            if isinstance(tree, dict):
                return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
            top = prefix[1] if len(prefix) > 1 and prefix[0] == 'backbone' \
                else (prefix[0] if prefix else '')
            return any(str(top).startswith(p) for p in prefixes)

        return walk(params)

    @jax.jit
    def train_step(params, rest, opt_state, z, x, gts, is_pos, key, freeze):
        def loss_fn(p):
            out, updates = module.apply(
                {'params': p, **rest}, z, x, train=True,
                mutable=['batch_stats'])
            cls_score, bbox_pred = out
            d = siamrpn_loss(cls_score, bbox_pred, gts, is_pos, key, tcfg)
            return d['loss_rpn_cls'] + d['loss_rpn_bbox'], (d, updates)

        (total, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.tree.map(lambda g, f: jnp.where(f, 0.0, g), grads,
                             freeze)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        rest_new = {**rest, 'batch_stats': updates['batch_stats']}
        return params, rest_new, opt_state, total, losses

    step = 0
    for epoch in range(args.epochs):
        prefixes = siamrpn_unfreeze_prefixes(epoch, args.unfreeze_epoch)
        freeze = frozen_mask(params, prefixes)
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            z, x, gts, is_pos = make_batch(ds, args, rng, feat)
            key = jax.random.PRNGKey(args.seed * 100003 + step)
            params, rest, opt_state, total, losses = train_step(
                params, rest, opt_state, jnp.asarray(z), jnp.asarray(x),
                jnp.asarray(gts), jnp.asarray(is_pos), key, freeze)
            step += 1
            if it % 50 == 0:
                print(f'[epoch {epoch} it {it}] total={float(total):.4f} '
                      f'cls={float(losses["loss_rpn_cls"]):.4f} '
                      f'bbox={float(losses["loss_rpn_bbox"]):.4f} '
                      f'lr={float(schedule(step)):.5f}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        if (epoch + 1) % args.ckpt_interval == 0 or epoch == args.epochs - 1:
            save_checkpoint(os.path.join(args.work_dir,
                                         f'siamrpn_e{epoch + 1}.ckpt'),
                            {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
