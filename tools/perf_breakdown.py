"""Per-component device timing of the flagship MOT per-frame program.

Times each pipeline slice (preprocess, backbone, +neck, +head, full step)
by scanning it N times inside ONE jitted program — per-call host timings
through the dev tunnel quantize to a ~28 ms polling tick and measure the
tunnel, not the chip (see .claude/skills/verify).  Loop-invariant hoisting
is defeated by perturbing the input with the iteration index.

Run ONLY on the real chip, never concurrently with anything else:
    python tools/perf_breakdown.py            # bf16, 1080p, 8 streams
"""
import functools
import json
import os
import sys
import time

import numpy as np

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def timed_scan(fn, args, n_iter=20, perturb=None):
    """Device seconds per iteration of fn(*args), measured as one scanned
    program.  ``perturb``: index (or tuple of indices) of the args to nudge
    by the loop counter (defaults to the last arg).  EVERY data input the
    measured slice consumes must be perturbed: any arg left constant makes
    everything computed purely from it loop-invariant, and XLA hoists that
    whole sub-graph out of the scan (measured: a constant disparity input
    hoisted the entire disparity branch + depth path, under-reporting the
    full step by 18 ms)."""
    import jax
    import jax.numpy as jnp

    ks = ((perturb,) if isinstance(perturb, int)
          else tuple(perturb) if perturb is not None else (len(args) - 1,))

    @jax.jit
    def run(args):
        def body(carry, i):
            a = list(args)
            for k in ks:
                a[k] = jax.tree.map(
                    lambda x: x + jnp.asarray(i, x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.number) else x, a[k])
            out = fn(*a)
            s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32)))
                    for x in jax.tree.leaves(out)
                    if hasattr(x, 'dtype')
                    and jnp.issubdtype(x.dtype, jnp.number))
            return carry + s, None

        total, _ = jax.lax.scan(body, jnp.float32(0.),
                                jnp.arange(n_iter))
        return total

    r = run(args)          # compile + warm
    float(r)
    t0 = time.perf_counter()
    float(run(args))
    return (time.perf_counter() - t0) / n_iter


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.models.csp_darknet import CSPDarknetDual
    from stereotracking_tpu.models.mot import MOTConfig, predict_frame_raw
    from stereotracking_tpu.models.pafpn import YOLOXPAFPN
    from stereotracking_tpu.models.preprocessor import (padded_shape,
                                                        preprocess_frame_pure)
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 1080, 1920
    n_streams = 8
    oh, ow = padded_shape(h, w)
    dtype = jnp.bfloat16
    cfg = MOTConfig()

    ms = MultiStreamTracker(cfg, n_streams=n_streams, dtype=dtype,
                            input_shape=(oh, ow))
    module, variables = ms.module, ms.variables

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (n_streams, h, w, 3), np.uint8))
    disps = jnp.asarray(
        rng.randint(16, 1600, (n_streams, h, w), np.uint16))

    report = {}

    # 1) full per-frame program (preproc + forward + decode/NMS + depth +
    #    tracker), exactly the bench path
    states = ms.states

    def full(states, imgs, disps, fid):
        fn = functools.partial(predict_frame_raw, variables, module,
                               cfg=cfg, out_h=oh, out_w=ow)
        return jax.vmap(fn)(states, imgs, disps, fid)

    # perturb images AND disparities (see timed_scan docstring): a constant
    # arg hoists its entire dependent sub-graph out of the loop.
    fids = jnp.ones((n_streams,), jnp.int32)
    report['full_step_ms'] = timed_scan(
        full, (states, imgs, disps, fids), perturb=(1, 2)) * 1e3

    # 2) device preprocessing only
    def prep(imgs, disps):
        return jax.vmap(lambda i, d: preprocess_frame_pure(
            i, d, oh, ow))(imgs, disps)

    report['preprocess_ms'] = timed_scan(prep, (imgs, disps),
                                         perturb=(0, 1)) * 1e3

    inputs = prep(imgs, disps)
    inputs = jax.tree.map(jnp.asarray, inputs)

    # 3) backbone only
    bb = CSPDarknetDual(cfg.detector.deepen_factor,
                        cfg.detector.widen_factor, dtype=dtype)
    bparams = {'params': variables['params']['backbone'],
               'batch_stats': variables['batch_stats']['backbone']}

    def bb_fwd(inputs):
        return jax.vmap(lambda x: bb.apply(bparams, x))(inputs)

    report['backbone_ms'] = timed_scan(bb_fwd, (inputs,), perturb=0) * 1e3

    # 4) backbone + neck
    neck = YOLOXPAFPN(deepen_factor=cfg.detector.deepen_factor,
                      widen_factor=cfg.detector.widen_factor, dtype=dtype)
    nparams = {'params': variables['params']['neck'],
               'batch_stats': variables['batch_stats']['neck']}

    def bn_fwd(inputs):
        f = jax.vmap(lambda x: bb.apply(bparams, x))(inputs)
        return jax.vmap(lambda t: neck.apply(nparams, t))(f)

    report['backbone_neck_ms'] = timed_scan(bn_fwd, (inputs,),
                                            perturb=0) * 1e3

    # 5) full detector forward (adds the head)
    def det_fwd(inputs):
        return jax.vmap(lambda x: module.apply(variables, x))(inputs)

    report['forward_ms'] = timed_scan(det_fwd, (inputs,), perturb=0) * 1e3

    # 6) detector_predict (forward + decode + NMS) — isolates decode/NMS
    from stereotracking_tpu.models.detector import detector_predict

    def det_pred(inputs):
        return jax.vmap(lambda x: detector_predict(
            variables, module, x, (1.0, 1.0)))(inputs)

    report['forward_decode_nms_ms'] = timed_scan(det_pred, (inputs,),
                                                 perturb=0) * 1e3

    # 7) per-box depth extraction (the 2-call reporting shape)
    from stereotracking_tpu.ops.depth import extract_box_depths

    nd = cfg.tracker.num_dets
    depth_map = jnp.asarray(
        rng.uniform(1.0, 80.0, (n_streams, oh, ow)).astype(np.float32))
    boxes = jnp.asarray(
        rng.uniform(0, 900, (n_streams, nd, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 64.0)
    bvalid = jnp.ones((n_streams, nd), bool)

    def depth2(depth_map, boxes):
        f = lambda m, b, v: extract_box_depths(m, b, v, cfg.depth_crop,
                                               cfg.depth_mode)
        d1, s1 = jax.vmap(f)(depth_map, boxes, bvalid)
        d2, s2 = jax.vmap(f)(depth_map, boxes + 1.0, bvalid)
        return d1 + d2, s1 + s2

    # NOTE synthetic WORST CASE: 64 scattered random boxes per stream, all
    # valid, two calls.  The production step does ONE call
    # (reuse_det_depth=True) on NMS valid-prefix boxes, fused into the full
    # program where XLA overlaps the gathers with independent work — its
    # true in-context cost is bounded by post_ms (measured 4.6 ms vs 25.4
    # here).  Kept as a stress probe, not a pipeline slice.
    report['depth_extract_worstcase_x2_ms'] = timed_scan(
        depth2, (depth_map, boxes), perturb=(0, 1)) * 1e3

    # 8) optional backbone stage split (STTPU_STAGES=1): time cumulative
    # prefixes by shrinking out_indices — XLA dead-code-eliminates the
    # unconsumed later stages, and out_indices=(2,...) keeps the production
    # s2d+fold layout for stem/stage1.
    if os.environ.get('STTPU_STAGES') == '1':
        def prefix_ms(out_idx):
            b = CSPDarknetDual(cfg.detector.deepen_factor,
                               cfg.detector.widen_factor,
                               out_indices=out_idx, dtype=dtype)

            def fwd(inputs):
                return jax.vmap(lambda x: b.apply(bparams, x))(inputs)
            return timed_scan(fwd, (inputs,), perturb=0) * 1e3

        p2 = prefix_ms((2,))
        p3 = prefix_ms((2, 3))
        report['bb_stem_s1_s2_ms'] = p2
        report['bb_stage3_ms'] = p3 - p2
        report['bb_stage4_ms'] = report['backbone_ms'] - p3

    report['neck_ms'] = report['backbone_neck_ms'] - report['backbone_ms']
    report['head_ms'] = report['forward_ms'] - report['backbone_neck_ms']
    report['decode_nms_ms'] = (report['forward_decode_nms_ms']
                               - report['forward_ms'])
    report['post_ms'] = (report['full_step_ms'] - report['forward_ms']
                         - report['preprocess_ms'])
    report = {k: round(v, 3) for k, v in report.items()}
    report['note'] = (f'{n_streams} streams x {h}x{w}, bf16; ms per '
                      'batched step (all streams)')
    print(json.dumps(report))


if __name__ == '__main__':
    main()
