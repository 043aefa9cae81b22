#!/usr/bin/env python
"""Tracking evaluation runner — the flagship flow (reference tools/test.py).

Iterates the validation videos frame-by-frame (VideoSampler order), runs the
jitted per-frame MOT program, streams GT + predictions into the MOT metrics
(HOTA/CLEAR/Identity with the 0-80 m depth protocol) and COCO bbox mAP, and
dumps the per-frame depth CSV.
"""
import argparse
import json
import os
import sys
import time

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description='Test a stereo tracker')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--work-dir', default='work_dirs/test')
    p.add_argument('--depth-thr', type=float, default=80.0)
    p.add_argument('--ignore-depth', action='store_true')
    p.add_argument('--max-videos', type=int, default=None)
    p.add_argument('--dump-txt', action='store_true')
    p.add_argument('--interpolate', action='store_true',
                   help='tracklet gap interpolation before scoring '
                        '(postprocess_tracklet_cfg capability)')
    p.add_argument('--aflink', default=None, metavar='CKPT',
                   help='AFLink tracklet re-linking before scoring using a '
                        'checkpoint from tools/utils/train_aflink.py '
                        '(reference AppearanceFreeLink)')
    p.add_argument('--results-csv', default=None)
    p.add_argument('--show-dir', default=None,
                   help='render every Nth frame (GT panel over predictions) '
                        'into this directory (TrackVisualizationHook '
                        'capability, engine/hooks/visualization_hook.py)')
    p.add_argument('--show-interval', type=int, default=30,
                   help='frame interval for --show-dir (reference '
                        'default 30)')
    p.add_argument('--show-errors', action='store_true',
                   help='with --show-dir: color-code TP/FP/FN/IDSW '
                        '(mot_error_visualization capability) instead of '
                        'the GT/pred panel')
    p.add_argument('--bf16', action='store_true',
                   help='bfloat16 detector compute')
    p.add_argument('--streams', type=int, default=1,
                   help='evaluate N videos concurrently through the '
                        'multistream batched program '
                        '(parallel/multistream.py) — the serving scale-out '
                        'surface; batches detector/depth/tracker across '
                        'videos on one chip')
    p.add_argument('--stage-frames', action='store_true',
                   help='with --streams: pre-stage each video group\'s raw '
                        'frames in device HBM before the timed loop (the '
                        'production DMA-fed frame buffer analog) so the '
                        'reported fps measures the serving surface, not '
                        'this dev environment\'s host->device tunnel')
    p.add_argument('--launcher', choices=['none', 'jax'], default='none',
                   help="'jax': initialize jax.distributed (coordinator / "
                        'world size / rank from --dist-* or STTPU_* env), '
                        'split videos across processes (VideoSampler) and '
                        'all-gather metric buffers before scoring')
    p.add_argument('--dist-coordinator', default=None)
    p.add_argument('--dist-num-processes', type=int, default=None)
    p.add_argument('--dist-process-id', type=int, default=None)
    p.add_argument('--cfg-options', nargs='*', default=None)
    return p.parse_args()


def _honor_jax_platforms_env():
    """In this environment a sitecustomize pre-registers the TPU plugin and
    the JAX_PLATFORMS env var alone is NOT honored — an explicit
    ``JAX_PLATFORMS=cpu`` still lands on the accelerator unless the
    already-imported config is updated in-process."""
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

    from stereotracking_tpu.apis.builder import build_model
    from stereotracking_tpu.apis.inference import init_model
    from stereotracking_tpu.config import apply_overrides, load_config
    from stereotracking_tpu.data import MOTDispDataset, PrefetchIterator
    from stereotracking_tpu.evaluation import (CocoMAPEvaluator,
                                               MOTDroneMetrics)
    from stereotracking_tpu.models.preprocessor import (padded_shape,
                                                        preprocess_frame)
    from stereotracking_tpu.data import transforms as T
    from stereotracking_tpu.utils.collect_results import ResultsCSV

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    from stereotracking_tpu.utils.obs import build_logger
    logger = build_logger(cfg, args.work_dir, rank=rank)
    ds_cfg = dict(cfg['test_dataloader']['dataset'])
    ds_type = ds_cfg.pop('type', 'MOTDispDataset')
    ds_cfg.pop('classes', None)
    if ds_type == 'DanceTrackDataset':
        from stereotracking_tpu.data import DanceTrackDataset
        dataset = DanceTrackDataset(
            data_root=ds_cfg.get('data_root', ''),
            split=ds_cfg.get('split', 'val'),
            visibility_thr=ds_cfg.get('visibility_thr', -1.0))
    else:
        ds_cls = MOTDispDataset
        kw = {}
        if ds_type == 'MOTKittiDataset':
            from stereotracking_tpu.data import MOTKittiDataset
            ds_cls = MOTKittiDataset
        elif 'path_token' in ds_cfg:
            kw['path_token'] = ds_cfg['path_token']
        dataset = ds_cls(
            ann_file=os.path.join(ds_cfg.get('data_root', ''),
                                  ds_cfg['ann_file']),
            data_root=ds_cfg.get('data_root', ''),
            img_prefix=ds_cfg.get('img_prefix', ''),
            depth_dir_name=ds_cfg.get('depth_dir_name'),
            classes=tuple(cfg.get('classes', ())) or None, **kw)

    # pick input shape from the first frame
    first = dataset.frame_info(dataset.video_frames(dataset.videos()[0])[0])
    ih, iw = first['height'], first['width']
    scale = cfg.get('img_scale', (ih, iw))
    f = T.rescale_factor(ih, iw, tuple(scale))
    rh, rw = int(ih * f + 0.5), int(iw * f + 0.5)
    oh, ow = padded_shape(rh, rw)

    model = init_model(cfg, args.checkpoint, input_shape=(oh, ow),
                       dtype=jnp.bfloat16 if args.bf16 else None)

    # DanceTrack is monocular: no meaningful depths on either side
    mot_metric = MOTDroneMetrics(depth_thr=args.depth_thr,
                                 ignore_depth=args.ignore_depth
                                 or ds_type == 'DanceTrackDataset',
                                 outfile_dir=os.path.join(args.work_dir,
                                                          'mot_txt'))
    coco_metric = CocoMAPEvaluator(num_classes=len(cfg.get('classes', ('x',))))
    csv_dump = ResultsCSV(args.results_csv) if args.results_csv else None

    videos = dataset.videos()
    if args.max_videos:
        videos = videos[:args.max_videos]
    if world > 1:
        # contiguous whole-video split across processes
        # (VideoSampler semantics, reference video_sampler.py:49-69)
        from stereotracking_tpu.data import VideoSampler
        videos = [v for v in VideoSampler(dataset, rank, world).vids
                  if v in set(videos)]

    visualizer = None
    if args.show_dir:
        from PIL import Image
        from stereotracking_tpu.visualization import (TrackVisualizer,
                                                      draw_mot_errors)
        visualizer = TrackVisualizer()

    # config-driven serving path: with model.stem_backend='pallas' (or
    # 'auto' on real TPU) frames enter through the raw-frame program with
    # host-packed pallas Focus stems — the production kernels are reachable
    # from this CLI, not only from bench.py
    use_raw = getattr(model.cfg, 'stem_backend', 'xla') == 'pallas'

    if args.streams > 1:
        n_frames, elapsed = _multistream_eval(
            args, model, dataset, videos, scale, f, oh, ow, use_raw,
            mot_metric, coco_metric, csv_dump, visualizer, logger)
        _finish(args, world, rank, mot_metric, coco_metric, n_frames,
                elapsed, logger)
        return

    n_frames = 0
    t_start = time.perf_counter()
    for vid in videos:
        vname = dataset.video_name(vid)
        frame_ids = dataset.video_frames(vid)
        prev_match = {}
        loader = PrefetchIterator(frame_ids, dataset.load_frame,
                                  num_workers=4)
        for local_f, sample in enumerate(loader):
            if f != 1.0:
                sample = T.resize_keep_ratio(sample, tuple(scale))
            disp_fixed = np.where(
                sample['disp_mask'] > 0,
                (sample['disp_postp'] * 16).astype(np.uint16),
                np.uint16(65535)).astype(np.uint16)
            sf = sample.get('scale_factor', (1.0, 1.0))
            if use_raw:
                img_u8 = np.clip(np.rint(np.asarray(sample['img'],
                                                    np.float32)),
                                 0, 255).astype(np.uint8)
                res = model.track_raw(
                    img_u8, disp_fixed, local_f, scale_factor=sf,
                    depth_raw=sample.get('depth_postp'))
            else:
                inputs = preprocess_frame(
                    jnp.asarray(sample['img']), jnp.asarray(disp_fixed),
                    oh, ow,
                    depth_raw=jnp.asarray(sample['depth_postp'])
                    if 'depth_postp' in sample else None)
                res = model.track(inputs, local_f, scale_factor=sf)
            n_frames += 1

            # ONE batched D2H transfer (per-array np.asarray pays a
            # ~28 ms tunnel round trip EACH — see _multistream_eval)
            res = jax.device_get(res)
            tv = np.asarray(res.track_valid)
            mot_metric.process_frame(
                vname, local_f,
                gt_ids=sample['gt_instance_ids'],
                gt_bboxes=sample['gt_bboxes'],
                gt_depths=sample['gt_locations'][:, 2]
                if len(sample['gt_locations']) else None,
                pred_ids=np.asarray(res.track_ids)[tv],
                pred_bboxes=np.asarray(res.track_bboxes)[tv],
                pred_depths=np.asarray(res.track_depths)[tv])
            dv = np.asarray(res.det_valid)
            coco_metric.add_gt(sample['img_id'], sample['gt_bboxes'],
                               sample['gt_labels'])
            coco_metric.add_dt(sample['img_id'],
                               np.asarray(res.det_bboxes)[dv],
                               np.asarray(res.det_scores)[dv],
                               np.asarray(res.det_labels)[dv])
            if csv_dump:
                csv_dump.append_frame(local_f, res)
            if visualizer is not None and local_f % args.show_interval == 0:
                vis_dir = os.path.join(args.show_dir, vname)
                os.makedirs(vis_dir, exist_ok=True)
                img = sample['img'].astype(np.uint8)
                if args.show_errors:
                    frame_img, prev_match = draw_mot_errors(
                        img, sample['gt_bboxes'], sample['gt_instance_ids'],
                        np.asarray(res.track_bboxes)[tv],
                        np.asarray(res.track_ids)[tv], prev_match)
                else:
                    frame_img = visualizer.draw_gt_pred(
                        img, sample['gt_bboxes'], sample['gt_instance_ids'],
                        np.asarray(res.track_bboxes)[tv],
                        np.asarray(res.track_ids)[tv],
                        np.asarray(res.track_scores)[tv])
                Image.fromarray(frame_img).save(
                    os.path.join(vis_dir, f'{local_f:06d}.jpg'))
        print(f'[test] video {vname}: {len(frame_ids)} frames done',
              flush=True)
        logger.log(n_frames, dict(
            video_frames=len(frame_ids),
            fps=n_frames / max(time.perf_counter() - t_start, 1e-9)),
            prefix='eval')

    elapsed = time.perf_counter() - t_start
    _finish(args, world, rank, mot_metric, coco_metric, n_frames, elapsed,
            logger)


def _multistream_eval(args, model, dataset, videos, scale, f, oh, ow,
                      use_raw, mot_metric, coco_metric, csv_dump,
                      visualizer, logger):
    """Evaluate N videos concurrently through the multistream batched
    program (parallel/multistream.py) — the eval-loop scale-out surface.

    Videos are grouped S at a time and stepped in lockstep; shorter videos
    in a group replay their last frame with outputs ignored (the tracker
    state is per-stream so real streams are unaffected).  With
    ``--stage-frames`` each group's raw frames (and, on the pallas path,
    their host-packed stem layouts) are staged in device HBM before the
    timed loop — the production DMA-fed frame buffer analog — so the
    reported fps measures sampler+step+metrics+CSV, not the dev tunnel.
    """
    import jax
    import jax.numpy as jnp

    from stereotracking_tpu.data import PrefetchIterator
    from stereotracking_tpu.data import transforms as T
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    S = args.streams
    ms = MultiStreamTracker(model.cfg, n_streams=S,
                            variables=model.variables,
                            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                            input_shape=(oh, ow))

    def to_raw(sample):
        img_u8 = np.clip(np.rint(np.asarray(sample['img'], np.float32)),
                         0, 255).astype(np.uint8)
        disp_fixed = np.where(
            sample['disp_mask'] > 0,
            (sample['disp_postp'] * 16).astype(np.uint16),
            np.uint16(65535)).astype(np.uint16)
        return img_u8, disp_fixed

    n_frames = 0
    elapsed = 0.0
    for g0 in range(0, len(videos), S):
        group = videos[g0:g0 + S]
        real = len(group)
        group = group + [group[0]] * (S - real)     # dummy pad, ignored
        frame_lists = [dataset.video_frames(v) for v in group]
        names = [dataset.video_name(v) for v in group]
        L = max(len(frame_lists[s]) for s in range(real))
        prev_match = [{} for _ in range(real)]

        def load_t(t):
            samples = []
            for fl in frame_lists:
                s = dataset.load_frame(fl[min(t, len(fl) - 1)])
                if f != 1.0:
                    s = T.resize_keep_ratio(s, tuple(scale))
                samples.append(s)
            imgs, disps = zip(*(to_raw(s) for s in samples))
            entry = [np.stack(imgs), np.stack(disps)]
            if use_raw:
                entry += list(MultiStreamTracker.pack_frames(
                    entry[0], entry[1], oh, ow))
            return samples, entry

        def step(entry, t, sf):
            if use_raw:
                return ms.track_packed(entry[0], entry[1], entry[2],
                                       entry[3], [t] * S, scale_factor=sf)
            return ms.track_raw(entry[0], entry[1], [t] * S,
                                scale_factor=sf)

        if args.stage_frames:
            staged = []
            for t in range(L):
                samples_t, entry = load_t(t)
                staged.append((samples_t, [jax.block_until_ready(
                    jnp.asarray(x)) for x in entry]))
            sf0 = staged[0][0][0].get('scale_factor', (1.0, 1.0))
            # compile + warm; the timed loop re-steps frame 0, whose
            # frame_id==0 resets the per-stream track state in-program.
            # VALUE fetch, not block_until_ready: through the dev tunnel
            # the latter can return before device completion and the
            # compile would drain inside the timed loop (bench gotcha)
            _ = jax.device_get(step(staged[0][1], 0, sf0).track_valid)
            it = iter(staged)
        else:
            it = iter(PrefetchIterator(list(range(L)), load_t,
                                       num_workers=4))

        def consume(t, samples, res):
            nonlocal n_frames
            # ONE batched D2H transfer: a per-array np.asarray costs a
            # full ~28 ms tunnel round trip EACH (12 arrays = ~330 ms,
            # measured — it was the whole eval-loop budget); device_get
            # moves the pytree in one transfer (~33 ms), and the
            # one-step-behind pipeline below overlaps it with the next
            # device step.
            res_np = jax.device_get(res)
            for s in range(real):
                if t >= len(frame_lists[s]):
                    continue
                n_frames += 1
                sample = samples[s]
                one = jax.tree.map(lambda x: x[s], res_np)
                tv = one.track_valid
                mot_metric.process_frame(
                    names[s], t,
                    gt_ids=sample['gt_instance_ids'],
                    gt_bboxes=sample['gt_bboxes'],
                    gt_depths=sample['gt_locations'][:, 2]
                    if len(sample['gt_locations']) else None,
                    pred_ids=one.track_ids[tv],
                    pred_bboxes=one.track_bboxes[tv],
                    pred_depths=one.track_depths[tv])
                dv = one.det_valid
                coco_metric.add_gt(sample['img_id'], sample['gt_bboxes'],
                                   sample['gt_labels'])
                coco_metric.add_dt(sample['img_id'], one.det_bboxes[dv],
                                   one.det_scores[dv], one.det_labels[dv])
                if csv_dump:
                    csv_dump.append_frame(t, one)
                if visualizer is not None and t % args.show_interval == 0:
                    from PIL import Image
                    from stereotracking_tpu.visualization import \
                        draw_mot_errors
                    vis_dir = os.path.join(args.show_dir, names[s])
                    os.makedirs(vis_dir, exist_ok=True)
                    img = sample['img'].astype(np.uint8)
                    if args.show_errors:
                        frame_img, prev_match[s] = draw_mot_errors(
                            img, sample['gt_bboxes'],
                            sample['gt_instance_ids'],
                            one.track_bboxes[tv], one.track_ids[tv],
                            prev_match[s])
                    else:
                        frame_img = visualizer.draw_gt_pred(
                            img, sample['gt_bboxes'],
                            sample['gt_instance_ids'],
                            one.track_bboxes[tv], one.track_ids[tv],
                            one.track_scores[tv])
                    Image.fromarray(frame_img).save(
                        os.path.join(vis_dir, f'{t:06d}.jpg'))

        t_start = time.perf_counter()
        pending = None            # one step behind: fetch t-1 while the
        for t, (samples, entry) in enumerate(it):   # device runs step t
            sf = samples[0].get('scale_factor', (1.0, 1.0))
            res = step(entry, t, sf)
            if pending is not None:
                consume(*pending)
            pending = (t, samples, res)
        if pending is not None:
            consume(*pending)
        elapsed += time.perf_counter() - t_start
        print(f'[test] group {[names[s] for s in range(real)]}: '
              f'{L} steps done '
              f'({n_frames / max(elapsed, 1e-9):.1f} pairs/s cum)',
              flush=True)
        logger.log(n_frames, dict(
            group_frames=L * real,
            fps=n_frames / max(elapsed, 1e-9)), prefix='eval')
    return n_frames, elapsed


def _finish(args, world, rank, mot_metric, coco_metric, n_frames, elapsed,
            logger):
    import json

    if args.aflink:
        from stereotracking_tpu.evaluation import AppearanceFreeLink
        from stereotracking_tpu.train.checkpoint import load_checkpoint
        linker = AppearanceFreeLink()
        linker.variables = load_checkpoint(args.aflink, linker.variables)
        for v in list(mot_metric._pred):
            mot_metric._pred[v] = linker.link(mot_metric._pred[v])
    if args.interpolate:
        from stereotracking_tpu.evaluation import interpolate_tracklets
        for v in list(mot_metric._pred):
            mot_metric._pred[v] = interpolate_tracklets(mot_metric._pred[v])
    if world > 1:
        # collective: every rank participates in the gather, rank 0 scores
        from stereotracking_tpu.evaluation.mot_metrics import (
            gather_across_hosts, gather_coco_across_hosts)
        mot_metric = gather_across_hosts(mot_metric)
        coco_metric = gather_coco_across_hosts(coco_metric)
        from stereotracking_tpu.parallel.dist import allgather_pyobj
        n_frames = sum(allgather_pyobj(n_frames))
        if rank != 0:
            return
    results = {}
    results.update(mot_metric.evaluate())
    results.update(coco_metric.evaluate())
    results['fps'] = n_frames / elapsed
    if args.dump_txt:
        mot_metric.dump_txt()

    os.makedirs(args.work_dir, exist_ok=True)
    with open(os.path.join(args.work_dir, 'metrics.json'), 'w') as fjson:
        json.dump({k: float(v) for k, v in results.items()}, fjson, indent=2)
    logger.log(n_frames, {k: v for k, v in results.items()
                          if isinstance(v, (int, float))}, prefix='metrics')
    logger.close()
    for k, v in results.items():
        print(f'{k}: {v:.4f}' if isinstance(v, float) else f'{k}: {v}')


if __name__ == '__main__':
    main()
