"""Train PrDiMP (probabilistic DiMP) — classifier + IoUNet.

The SOT analog of tools/train_stark.py for the DiMP family (reference
configs/sot/prdimp + mmtrack/models/sot/prdimp.py training path):
DiMP-sampled template/search frames (data/sot.dimp_sampling), square
crops around jittered boxes (models/sot/prdimp.prdimp_crop), then

* classifier: filter initialized from the template crops and trained
  through the UNROLLED steepest-descent optimizer with the KL objective
  (prdimp_cls_train_loss; filter_optimizer.py:174-285) — here the
  optimizer iterates run directly on the search-frame features (cited
  simplification of the reference's train-frames/test-frames split);
* bbox head: IoUNet scored on GMM proposals around the search gt with
  the KL Monte-Carlo loss (sample_gmm_proposals + kl_mc_loss;
  iounet_head.py:442-653).

Backbone norm layers stay in eval mode (the reference freezes the
backbone for most of training)::

    python tools/train_prdimp.py --data-root got10k/train --dataset got10k \
        --epochs 50 --steps-per-epoch 500 --work-dir work_dirs/prdimp
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
    p = argparse.ArgumentParser(description='Train PrDiMP')
    p.add_argument('--data-root', required=True)
    p.add_argument('--dataset', default='got10k',
                   choices=['got10k', 'lasot', 'trackingnet', 'generic'])
    p.add_argument('--work-dir', default='work_dirs/prdimp')
    p.add_argument('--epochs', type=int, default=50)
    p.add_argument('--steps-per-epoch', type=int, default=500)
    p.add_argument('--base-lr', type=float, default=2e-4)
    p.add_argument('--img-sample-size', type=int, default=288)
    p.add_argument('--num-frames', type=int, default=3,
                   help='template and search frames per sequence')
    p.add_argument('--optim-iters', type=int, default=2,
                   help='unrolled steepest-descent iterations')
    p.add_argument('--num-proposals', type=int, default=128)
    p.add_argument('--cls-weight', type=float, default=100.0)
    p.add_argument('--bbox-weight', type=float, default=0.0025)
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
                                             dimp_sampling)
    from stereotracking_tpu.models.sot.prdimp import (
        PrDiMPModule, PrDiMPTestCfg, kl_mc_loss, prdimp_cls_train_loss,
        prdimp_crop, sample_gmm_proposals)
    from stereotracking_tpu.train.checkpoint import save_checkpoint

    cls = {'got10k': Got10kDataset, 'lasot': LaSOTDataset,
           'trackingnet': TrackingNetDataset,
           'generic': SOTVideoDataset}[args.dataset]
    ds = cls(args.data_root)
    rng = np.random.RandomState(args.seed)

    s = args.img_sample_size
    nf = args.num_frames
    cfg = PrDiMPTestCfg(img_sample_size=s)
    module = PrDiMPModule(cfg)
    variables = module.init(jax.random.PRNGKey(args.seed),
                            jnp.zeros((1, s, s, 3)),
                            jnp.asarray([[s * .4, s * .4, s * .6, s * .6]]))
    params = variables['params']
    rest = {k: v for k, v in variables.items() if k != 'params'}

    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adam(args.base_lr))
    opt_state = tx.init(params)

    def crop_batch(imgs, gts_xywh):
        """Jittered square crops -> (crops (N,S,S,3), boxes_xyxy (N,4))."""
        crops, boxes = [], []
        for img, gt in zip(imgs, gts_xywh):
            jit = gt.copy()
            jit[:2] += rng.randn(2) * 0.05 * gt[2:]
            jit[2:] *= np.exp(rng.randn(2) * 0.1)
            c = np.array([jit[0] + jit[2] / 2, jit[1] + jit[3] / 2,
                          jit[2], jit[3]], np.float32)
            patch, coord = prdimp_crop(jnp.asarray(img), jnp.asarray(c),
                                       cfg.search_scale_factor, s)
            coord = np.asarray(coord)
            tl = coord[:2] - coord[2:] / 2
            f = s / coord[2:]
            x1 = (gt[0] - tl[0]) * f[0]
            y1 = (gt[1] - tl[1]) * f[1]
            boxes.append([x1, y1, x1 + gt[2] * f[0], y1 + gt[3] * f[1]])
            crops.append(np.asarray(patch))
        return (jnp.asarray(np.stack(crops)),
                jnp.asarray(np.asarray(boxes, np.float32)))

    @jax.jit
    def step(params, opt_state, t_imgs, t_boxes, s_imgs, s_boxes, key):
        def loss_fn(p):
            v = {'params': p, **rest}
            tf3, tf4 = module.apply(v, t_imgs,
                                    method=PrDiMPModule.extract)
            sf3, sf4 = module.apply(v, s_imgs,
                                    method=PrDiMPModule.extract)
            tcf = module.apply(v, tf4, method=PrDiMPModule.cls_feats)
            scf = module.apply(v, sf4, method=PrDiMPModule.cls_feats)
            filt = module.apply(v, tcf, t_boxes,
                                method=PrDiMPModule.init_filter)
            log_step, f_reg = module.apply(
                v, method=PrDiMPModule.optimizer_params)
            s_cxcywh = jnp.concatenate(
                [(s_boxes[:, :2] + s_boxes[:, 2:]) / 2,
                 s_boxes[:, 2:] - s_boxes[:, :2]], axis=1)
            loss_cls = prdimp_cls_train_loss(
                filt, scf, s_cxcywh, args.optim_iters, cfg, log_step,
                f_reg)

            mod = module.apply(v, tf3[:1], tf4[:1], t_boxes[0],
                               method=PrDiMPModule.iou_modulation)
            sfeats = module.apply(v, sf3, sf4,
                                  method=PrDiMPModule.iou_search_feats)

            def one_frame(i, key_i):
                gt_xywh = jnp.concatenate(
                    [s_boxes[i, :2], s_boxes[i, 2:] - s_boxes[i, :2]])
                props, q, pd = sample_gmm_proposals(
                    gt_xywh, key_i, num_samples=args.num_proposals)
                sf_i = (sfeats[0][i:i + 1], sfeats[1][i:i + 1])
                scores = module.apply(v, mod, sf_i, props,
                                      method=PrDiMPModule.iou_predict)
                return kl_mc_loss(scores[None], q[None], pd[None])

            keys = jax.random.split(key, nf)
            loss_bbox = sum(one_frame(i, keys[i]) for i in range(nf)) / nf
            total = (args.cls_weight * loss_cls
                     + args.bbox_weight * loss_bbox)
            return total, dict(loss_cls=loss_cls, loss_bbox=loss_bbox)

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, u), opt_state, total, losses

    def load_sequence():
        while True:
            vi = ds.video_info(int(rng.randint(len(ds))))
            sample = dimp_sampling(vi, num_template_frames=nf,
                                   num_search_frames=nf, rng=rng)
            if sample is None:
                continue
            inds = sample['template_inds'] + sample['search_inds']
            imgs = [np.asarray(PIL.Image.open(
                vi['img_paths'][i]).convert('RGB'), np.float32)
                for i in inds]
            xyxy = [np.asarray(vi['bboxes'][i], np.float32) for i in inds]
            gts = [np.array([b[0], b[1], b[2] - b[0], b[3] - b[1]],
                            np.float32) for b in xyxy]
            if any(g[2] < 2 or g[3] < 2 for g in gts):
                continue
            return imgs[:nf], gts[:nf], imgs[nf:], gts[nf:]

    gstep = 0
    for epoch in range(args.epochs):
        t0 = time.time()
        for it in range(args.steps_per_epoch):
            t_imgs, t_gts, s_imgs, s_gts = load_sequence()
            ti, tb = crop_batch(t_imgs, t_gts)
            si, sb = crop_batch(s_imgs, s_gts)
            params, opt_state, total, losses = step(
                params, opt_state, ti, tb, si, sb,
                jax.random.PRNGKey(args.seed * 7919 + gstep))
            gstep += 1
            if it % 50 == 0:
                print(f'[epoch {epoch} it {it}] total={float(total):.4f} '
                      f'cls={float(losses["loss_cls"]):.4f} '
                      f'bbox={float(losses["loss_bbox"]):.4f}', flush=True)
        print(f'[epoch {epoch}] done in {time.time() - t0:.1f}s')
        if (epoch + 1) % args.ckpt_interval == 0 or epoch == args.epochs - 1:
            save_checkpoint(os.path.join(args.work_dir,
                                         f'prdimp_e{epoch + 1}.ckpt'),
                            {'params': params, **rest})
    print('training complete')


if __name__ == '__main__':
    main()
