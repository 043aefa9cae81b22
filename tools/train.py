#!/usr/bin/env python
"""Detector training runner (reference tools/train.py flow).

Data-parallel over the local device mesh: batches sharded on 'data', params
replicated, SyncBN for free via GSPMD global batch statistics.  Two-stage
pipeline (MixUp off + L1 aux on for the last epochs, reference
YOLOXModeSwitchHook), SGD-nesterov with quadratic-warmup->cosine schedule,
exponential-momentum EMA, rotating checkpoints with resume.
"""
import argparse
import functools
import os
import sys
import time

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Train the stereo detector')
    p.add_argument('config')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume', action='store_true')
    p.add_argument('--max-epochs', type=int, default=None)
    p.add_argument('--steps-per-epoch', type=int, default=None)
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--max-gt', type=int, default=64)
    p.add_argument('--img-scale', type=int, nargs=2, default=None)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--val-interval', type=int, default=None,
                   help='epochs between detector mAP validations '
                        '(reference val_interval=5); default: off')
    p.add_argument('--val-max-images', type=int, default=200)
    p.add_argument('--launcher', choices=['none', 'jax'], default='none',
                   help="'jax': initialize jax.distributed; every process "
                        'contributes batch_size/world_size local samples to '
                        'a global data-parallel batch (DDP semantics)')
    p.add_argument('--dist-coordinator', default=None)
    p.add_argument('--dist-num-processes', type=int, default=None)
    p.add_argument('--dist-process-id', type=int, default=None)
    p.add_argument('--cfg-options', nargs='*', default=None)
    return p.parse_args()


def make_batch(dataset, indices, scale, max_gt, rng, stage2: bool):
    """Host-side pipeline: load -> resize -> [MixUp] -> HSV -> flip ->
    filter -> pad; stack into fixed-shape arrays."""
    from stereotracking_tpu.data import transforms as T
    imgs, disps, masks = [], [], []
    gtb = np.zeros((len(indices), max_gt, 4), np.float32)
    gtl = np.zeros((len(indices), max_gt), np.int32)
    gtv = np.zeros((len(indices), max_gt), bool)
    for bi, idx in enumerate(indices):
        s = dataset.load_sample(idx)
        s = T.resize_keep_ratio(s, scale)
        if not stage2:
            other = dataset.load_sample(rng.randint(len(dataset)))
            other = T.resize_keep_ratio(other, scale)
            s = T.yolox_mixup(s, other, rng, img_scale=scale)
        s['img'] = T.hsv_random_aug(s['img'], rng)
        s = T.random_flip(s, rng)
        s = T.filter_annotations(s)
        s = T.pad_to_divisor(s, 32)
        imgs.append(s['img'].astype(np.float32))
        disps.append(s['disp_postp'].astype(np.float32))
        masks.append(s['disp_mask'].astype(np.float32))
        n = min(len(s['gt_bboxes']), max_gt)
        if n:
            gtb[bi, :n] = s['gt_bboxes'][:n]
            gtl[bi, :n] = s['gt_labels'][:n]
            gtv[bi, :n] = True
    img = np.stack(imgs)
    disp = np.stack(disps)[..., None].repeat(3, -1)
    mask = np.stack(masks)[..., None]
    return dict(img=img, disp_postp=disp, disp_mask=mask,
                gt_bboxes=gtb, gt_labels=gtl, gt_valid=gtv)


def _honor_jax_platforms_env():
    """sitecustomize pre-registers the TPU plugin; JAX_PLATFORMS env alone
    is not honored, so apply it to the imported config explicitly."""
    want = os.environ.get('JAX_PLATFORMS')
    if want:
        import jax
        jax.config.update('jax_platforms', want)


def main():
    args = parse_args()
    _honor_jax_platforms_env()
    rank, world = 0, 1
    if args.launcher == 'jax':
        from stereotracking_tpu.parallel.dist import init_distributed
        rank, world = init_distributed(args.dist_coordinator,
                                       args.dist_num_processes,
                                       args.dist_process_id)
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stereotracking_tpu.apis.builder import build_detector_config
    from stereotracking_tpu.config import apply_overrides, load_config
    from stereotracking_tpu.data import CocoDispDataset
    from stereotracking_tpu.models.detector import YOLOXDetector
    from stereotracking_tpu.parallel.mesh import make_mesh, shard_batch
    from stereotracking_tpu.train.checkpoint import (CheckpointManager,
                                                     extract_detector_variables,
                                                     save_checkpoint)
    from stereotracking_tpu.train.losses import YOLOXLossConfig
    from stereotracking_tpu.train.schedules import yolox_schedule
    from stereotracking_tpu.train.train_state import (create_train_state,
                                                      make_optimizer,
                                                      train_step)

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    work_dir = args.work_dir or os.path.join(
        'work_dirs', os.path.splitext(os.path.basename(args.config))[0])

    ds_cfg = dict(cfg['train_dataloader']['dataset'])
    dataset = CocoDispDataset(
        ann_file=os.path.join(ds_cfg.get('data_root', ''),
                              ds_cfg['ann_file']),
        data_root=ds_cfg.get('data_root', ''),
        img_prefix=ds_cfg.get('img_prefix', ''),
        classes=tuple(cfg.get('classes', ())) or None)

    scale = tuple(args.img_scale or cfg.get('img_scale', (720, 1280)))
    batch_size = args.batch_size or \
        cfg['train_dataloader'].get('batch_size', 8)
    max_epochs = args.max_epochs or cfg.get('max_epochs', 50)
    num_last = cfg.get('num_last_epochs', 5)
    steps_per_epoch = args.steps_per_epoch or \
        max(len(dataset) // batch_size, 1)
    base_lr = cfg.get('base_lr', 0.001 / 8 * batch_size)

    det_cfg = build_detector_config(cfg['model']['detector'])
    module = YOLOXDetector(det_cfg)
    sched = yolox_schedule(base_lr, steps_per_epoch, max_epochs,
                           warmup_epochs=2, num_last_epochs=num_last)
    optimizer = make_optimizer(sched)

    # input shape after resize+pad
    info = dataset.data_info(0)
    from stereotracking_tpu.data.transforms import rescale_factor
    f = rescale_factor(info['height'], info['width'], scale)
    rh = -(-int(info['height'] * f + 0.5) // 32) * 32
    rw = -(-int(info['width'] * f + 0.5) // 32) * 32

    state = create_train_state(module, jax.random.PRNGKey(args.seed),
                               (rh, rw), optimizer)
    ckpt = CheckpointManager(work_dir, interval=cfg.get(
        'save_epoch_intervals', 5))
    start_epoch = 0
    if args.resume:
        state, start_epoch = ckpt.resume(state)

    if world > 1:
        mesh = make_mesh()          # spans all processes' devices
    else:
        # largest device count that divides the batch (a 2-sample debug
        # batch on an 8-device host must not build an 8-way mesh)
        n_dev = len(jax.devices())
        mesh = make_mesh(max(d for d in range(1, n_dev + 1)
                             if batch_size % d == 0))
    state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state)

    # per-process data stream: each rank draws its own local slice of the
    # global batch (DistSamplerSeedHook analog: seed offset by rank)
    local_batch = batch_size // world if world > 1 else batch_size
    assert local_batch * world == batch_size or world == 1, \
        f'batch_size {batch_size} not divisible by world_size {world}'
    rng = np.random.RandomState(args.seed + rank)
    loss_cfg_s1 = YOLOXLossConfig(num_classes=det_cfg.num_classes)
    loss_cfg_s2 = loss_cfg_s1._replace(use_l1=True)
    step_fns = {
        False: jax.jit(functools.partial(
            train_step, module=module, optimizer=optimizer,
            loss_cfg=loss_cfg_s1)),
        True: jax.jit(functools.partial(
            train_step, module=module, optimizer=optimizer,
            loss_cfg=loss_cfg_s2)),
    }

    def run_validation(state):
        """Detector-only COCO mAP on the val split with EMA weights
        (reference val loop with CocoMetric, config :206-231)."""
        from stereotracking_tpu.data import MOTDispDataset
        from stereotracking_tpu.evaluation import CocoMAPEvaluator
        from stereotracking_tpu.models.detector import detector_predict
        from stereotracking_tpu.data import transforms as T

        vd = dict(cfg['val_dataloader']['dataset'])
        val_ds = MOTDispDataset(
            ann_file=os.path.join(vd.get('data_root', ''), vd['ann_file']),
            data_root=vd.get('data_root', ''),
            img_prefix=vd.get('img_prefix', ''),
            classes=tuple(cfg.get('classes', ())) or None)
        variables = {'params': state.ema_params,
                     'batch_stats': state.ema_batch_stats}
        pred_fn = jax.jit(lambda v, i: detector_predict(v, module, i))
        ev = CocoMAPEvaluator(num_classes=det_cfg.num_classes)
        img_ids = [i for v in val_ds.videos()
                   for i in val_ds.video_frames(v)][:args.val_max_images]
        for img_id in img_ids:
            s = val_ds.load_frame(img_id)
            s = T.resize_keep_ratio(s, scale)
            s = T.pad_to_divisor(s, 32)
            inputs = dict(
                img=jnp.asarray(s['img'][None].astype(np.float32)),
                disp_postp=jnp.asarray(
                    s['disp_postp'][None, ..., None].repeat(3, -1)),
                disp_mask=jnp.asarray(s['disp_mask'][None, ..., None]))
            det = pred_fn(variables, inputs)
            dv = np.asarray(det.valid)
            sf = s.get('scale_factor', (1.0, 1.0))
            ev.add_gt(img_id, s['gt_bboxes'] / sf[0], s['gt_labels'])
            ev.add_dt(img_id, np.asarray(det.boxes)[dv],
                      np.asarray(det.scores)[dv],
                      np.asarray(det.labels)[dv])
        res = ev.evaluate(areas=('all',))
        print(f'[val] mAP {res["mAP"]:.4f} mAP50 {res["mAP_50"]:.4f}',
              flush=True)
        return res

    from stereotracking_tpu.utils.obs import build_logger
    logger = build_logger(cfg, work_dir, rank=rank)

    for epoch in range(start_epoch, max_epochs):
        stage2 = epoch >= max_epochs - num_last
        t0 = time.perf_counter()
        for it in range(steps_per_epoch):
            idx = rng.randint(0, len(dataset), local_batch)
            batch = make_batch(dataset, idx, scale, args.max_gt, rng, stage2)
            batch = shard_batch(batch, mesh)
            state, losses = step_fns[stage2](state, batch)
            step = epoch * steps_per_epoch + it
            if it % 50 == 0 and rank == 0:
                print(f'epoch {epoch} it {it}/{steps_per_epoch} '
                      f'loss {float(losses["loss"]):.4f} '
                      f'(cls {float(losses["loss_cls"]):.3f} '
                      f'bbox {float(losses["loss_bbox"]):.3f} '
                      f'obj {float(losses["loss_obj"]):.3f}) '
                      f'pos {int(losses["num_pos"])}', flush=True)
            logger.log_every(step, dict(
                loss=losses['loss'], loss_cls=losses['loss_cls'],
                loss_bbox=losses['loss_bbox'], loss_obj=losses['loss_obj'],
                num_pos=losses['num_pos'], lr=sched(step), epoch=epoch))
        if rank == 0:
            dt = time.perf_counter() - t0
            print(f'epoch {epoch} done in {dt:.1f}s', flush=True)
            logger.log((epoch + 1) * steps_per_epoch - 1, dict(
                epoch_time_s=dt,
                imgs_per_s=steps_per_epoch * batch_size / dt),
                prefix='speed')
            ckpt.maybe_save(epoch, jax.device_get(state))
            if args.val_interval and (epoch + 1) % args.val_interval == 0:
                res = run_validation(state)
                logger.log((epoch + 1) * steps_per_epoch - 1, dict(
                    mAP=res['mAP'], mAP_50=res['mAP_50']), prefix='val')
    logger.close()

    if rank == 0:
        final = extract_detector_variables(jax.device_get(state))
        save_checkpoint(os.path.join(work_dir, 'detector_final.ckpt'), final)
        print(f'saved detector to {work_dir}/detector_final.ckpt')


if __name__ == '__main__':
    main()
