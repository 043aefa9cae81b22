"""Slice timings of the PACKED serving path (pallas stems) on the real chip.

Complements tools/perf_breakdown.py (which times the XLA-stem path): here the
program under test is exactly bench.py's default on-accelerator mode, split
into stems / stage1+2 / stage3+4 / depth / tracker so the remaining levers
can be ranked with data.  Run alone on the real chip:

    python tools/microbench_r3.py
"""
import functools
import json
import os
import sys

import numpy as np

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

from perf_breakdown import timed_scan  # noqa: E402  (same directory)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.models import tracker as trk
    from stereotracking_tpu.models.csp_darknet import CSPDarknetDual
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models.preprocessor import padded_shape
    from stereotracking_tpu.ops.depth import (disp_to_depth,
                                              extract_box_depths,
                                              extract_box_depths_disp)
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 1080, 1920
    n_streams = 8
    oh, ow = padded_shape(h, w)
    dtype = jnp.bfloat16
    cfg = MOTConfig()

    ms = MultiStreamTracker(cfg, n_streams=n_streams, dtype=dtype,
                            input_shape=(oh, ow))
    variables = ms.variables

    rng = np.random.RandomState(0)
    imgs = np.ascontiguousarray(
        rng.randint(0, 255, (n_streams, h, w, 3), np.uint8))
    disps = np.ascontiguousarray(
        rng.randint(16, 1600, (n_streams, h, w), np.uint16))
    ipacks, dpacks = MultiStreamTracker.pack_frames(imgs, disps, oh, ow)
    imgs, disps = jnp.asarray(imgs), jnp.asarray(disps)
    ipacks, dpacks = jnp.asarray(ipacks), jnp.asarray(dpacks)

    report = {}

    # 1) full packed step (bench.py default mode)
    def full(states, imgs, disps, ipacks, dpacks, fids):
        def one(s, i, d, ip, dp, f):
            return predict_frame_raw(variables, ms.module, s, i, d, f,
                                     cfg=cfg, out_h=oh, out_w=ow,
                                     img_pack=ip, disp_pack=dp)
        return jax.vmap(one)(states, imgs, disps, ipacks, dpacks, fids)

    fids = jnp.ones((n_streams,), jnp.int32)
    report['full_packed_step_ms'] = timed_scan(
        full, (ms.states, imgs, disps, ipacks, dpacks, fids),
        perturb=(1, 2, 3, 4)) * 1e3

    # 2) pallas stems alone
    bparams = variables['params']['backbone']
    bstats = variables['batch_stats']['backbone']

    def stems(ipacks, dpacks):
        return jax.vmap(lambda i, d: pallas_stem_outputs(
            bparams, bstats, i, d, ow // 4))(ipacks, dpacks)

    report['stems_pallas_ms'] = timed_scan(stems, (ipacks, dpacks),
                                           perturb=(0, 1)) * 1e3

    so, dso = stems(ipacks, dpacks)

    # 3) backbone tail from stem activations: stage1(dual, folded) + 2-4
    def bb_from(out_idx):
        bb = CSPDarknetDual(cfg.detector.deepen_factor,
                            cfg.detector.widen_factor,
                            out_indices=out_idx, dtype=dtype)
        pv = {'params': bparams, 'batch_stats': bstats}

        def fwd(so, dso):
            return jax.vmap(lambda a, b: bb.apply(
                pv, {'stem_out': a, 'disp_stem_out': b}))(so, dso)
        return fwd

    report['bb_tail_ms'] = timed_scan(bb_from((2, 3, 4)), (so, dso),
                                      perturb=(0, 1)) * 1e3
    report['bb_s1_s2_ms'] = timed_scan(bb_from((2,)), (so, dso),
                                       perturb=(0, 1)) * 1e3
    report['bb_s1_ms_approx'] = timed_scan(bb_from((1,)), (so, dso),
                                           perturb=(0, 1)) * 1e3

    # 4) per-box depth extraction, production formulation (mot.py:84-91):
    #    integer-domain corner_guided bisection straight on the padded
    #    uint16 disparity, ONE call, num_dets boxes, valid-prefix half full
    nd = cfg.tracker.num_dets
    boxes = jnp.asarray(rng.uniform(0, 900, (n_streams, nd, 4)).astype(
        np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 48.0)
    bvalid = jnp.arange(nd)[None, :] < (nd // 2)
    bvalid = jnp.broadcast_to(bvalid, (n_streams, nd))
    disps_pad = jnp.pad(disps, ((0, 0), (0, oh - h), (0, ow - w)))

    def depth_path(disps_pad, boxes):
        def one(d_u16, bx, bv):
            return extract_box_depths_disp(d_u16, bx, bv, cfg.baseline,
                                           cfg.focal_length, cfg.depth_crop)
        return jax.vmap(one)(disps_pad, boxes, bvalid)

    report['depth_path_ms'] = timed_scan(depth_path, (disps_pad, boxes),
                                         perturb=(0, 1)) * 1e3

    # 4b) the superseded float-domain formulation, kept for the record
    def depth_path_f32(disps, boxes):
        def one(d_u16, bx, bv):
            disp = jnp.where(d_u16 == 65535, 0, d_u16).astype(
                jnp.float32) / 16.0
            disp = jnp.pad(disp, ((0, oh - h), (0, ow - w)))
            dm = disp_to_depth(disp, cfg.baseline, cfg.focal_length)
            return extract_box_depths(dm, bx, bv, cfg.depth_crop,
                                      cfg.depth_mode)
        return jax.vmap(one)(disps, boxes, bvalid)

    report['depth_path_f32_ms'] = timed_scan(depth_path_f32, (disps, boxes),
                                             perturb=(0, 1)) * 1e3

    # 5) tracker step alone
    dets = trk.Detections(
        bboxes=boxes, scores=jnp.full((n_streams, nd), 0.8),
        labels=jnp.zeros((n_streams, nd), jnp.int32),
        scales=jnp.ones((n_streams, nd)),
        depths=jnp.full((n_streams, nd), 10.0), valid=bvalid)

    def tracker_step(states, dets):
        return jax.vmap(lambda s, d: trk.step(s, d, jnp.int32(1),
                                              cfg.tracker))(states, dets)

    report['tracker_step_ms'] = timed_scan(
        tracker_step, (ms.states, dets), perturb=1) * 1e3

    report = {k: round(v, 3) for k, v in report.items()}
    report['note'] = (f'{n_streams} streams x {h}x{w} packed path, bf16; '
                      'ms per batched step')
    print(json.dumps(report))


if __name__ == '__main__':
    main()
