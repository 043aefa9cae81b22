"""Per-slice device timing of the PACKED serving step (the bench path).

Times cumulative prefixes of the production program — packed stems ->
pallas stage 1 -> pallas stage 2 -> backbone rest -> neck -> head ->
decode/NMS -> full per-frame step (disp preprocess + depth + tracker) —
in the scanned anti-hoisting harness (tools/perf_breakdown.timed_scan).
Consecutive differences are the slice costs.

Caveat: the harness reduces each prefix's output to a scalar, so a prefix
that emits the huge stem activations (~534 MB per 8-stream step) carries
~0.7 ms more reduce tax than one emitting small feature pyramids —
differences between adjacent slices are biased by the CHANGE in output
size (noted per row as out_mb).

Run alone on the chip:  python tools/microbench_serving.py
"""
import functools
import json
import os
import sys

import numpy as np

if __name__ == '__main__' and not __package__:
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tools'))

from perf_breakdown import timed_scan  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.apis.builder import build_mot_config
    from stereotracking_tpu.models.mot import predict_frame_raw
    from stereotracking_tpu.models.preprocessor import padded_shape
    from stereotracking_tpu.ops.nms import batched_nms, multiclass_candidates
    from stereotracking_tpu.ops.stage1_pallas import pallas_stage1_out
    from stereotracking_tpu.ops.stage2_pallas import (pallas_stage2_out,
                                                      pallas_stage3_out)
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.models.yolox_head import decode_predictions
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 1080, 1920
    n = 8
    oh, ow = padded_shape(h, w)
    cfg = build_mot_config({'type': 'OCSORT_Disparity',
                            'depth_backend': 'auto', 'stem_backend': 'auto',
                            'stage1_backend': 'auto',
                            'stage2_backend': 'auto',
                            'stage3_backend': 'auto'})
    ms = MultiStreamTracker(cfg, n_streams=n, dtype=jnp.bfloat16,
                            input_shape=(oh, ow))
    variables, module = ms.variables, ms.module
    bp = variables['params']['backbone']
    bs = variables['batch_stats']['backbone']

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (n, h, w, 3), np.uint8)
    disps = rng.randint(16, 1600, (n, h, w), np.uint16)
    ipn, dpn = MultiStreamTracker.pack_frames(imgs, disps, oh, ow)
    ip, dp = jnp.asarray(ipn), jnp.asarray(dpn)
    imgs, disps = jnp.asarray(imgs), jnp.asarray(disps)

    def stems1(i, d):
        return pallas_stem_outputs(bp, bs, i, d, ow // 4)

    def stage2_from(i, d):
        so, dso = stems1(i, d)
        y1 = pallas_stage1_out(bp, bs, so, dso)
        return pallas_stage2_out(bp, bs, y1)

    def stage3_from(i, d):
        y2 = stage2_from(i, d)
        return y2, pallas_stage3_out(bp, bs, y2)

    def fwd_from(i, d):
        if use_stage3:
            y2, y3 = stage3_from(i, d)
            return module.apply(variables,
                                {'stage2_out': y2, 'stage3_out': y3},
                                train=False)
        return module.apply(variables, {'stage2_out': stage2_from(i, d)},
                            train=False)

    def decode_from(i, d):
        cls, reg, obj = fwd_from(i, d)
        boxes, scores = decode_predictions(cls, reg, obj,
                                           cfg.detector.strides)
        fb, fs, fl = multiclass_candidates(boxes[0], scores[0],
                                           cfg.detector.score_thr)
        return batched_nms(fb, fs, fl, cfg.detector.nms_iou_thr,
                           cfg.detector.score_thr,
                           cfg.detector.pre_nms_top_k,
                           cfg.detector.max_per_img)

    use_stage3 = os.environ.get('MICRO_STAGE3', '1') == '1'
    slices = [
        ('stems', lambda i, d: stems1(i, d)),
        ('stage1', lambda i, d: pallas_stage1_out(bp, bs, *stems1(i, d))),
        ('stage2', stage2_from),
    ] + ([('stage3', stage3_from)] if use_stage3 else []) + [
        ('forward', fwd_from),
        ('decode_nms', decode_from),
    ]

    report = {}
    prev = 0.0
    for name, fn in slices:
        t = timed_scan(lambda i, d: jax.vmap(fn)(i, d), (ip, dp),
                       perturb=(0, 1)) * 1e3
        out = jax.vmap(fn)(ip, dp)
        mb = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(out)
                 if hasattr(x, 'size')) / 1e6
        report[name] = {'cum_ms': round(t, 3),
                        'slice_ms': round(t - prev, 3),
                        'out_mb': round(mb, 1)}
        prev = t
        print(json.dumps({name: report[name]}), flush=True)

    def full(states, disps, i, d, fids):
        fn = functools.partial(predict_frame_raw, variables, module,
                               cfg=cfg, out_h=oh, out_w=ow)
        return jax.vmap(lambda s, dd, ii, pp, f: fn(
            s, imgs[0], dd, f, img_pack=ii, disp_pack=pp))(
                states, disps, i, d, fids)

    fids = jnp.ones((n,), jnp.int32)
    t = timed_scan(full, (ms.states, disps, ip, dp, fids),
                   perturb=(1, 2, 3)) * 1e3
    report['full_step'] = {'cum_ms': round(t, 3),
                           'slice_ms': round(t - prev, 3)}
    report['note'] = (f'{n} streams x {h}x{w} bf16 packed serving path; '
                      'slice_ms = cum diff; full_step slice = disp '
                      'preprocess + depth + tracker + report')
    print(json.dumps(report))


if __name__ == '__main__':
    main()
