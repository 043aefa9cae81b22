"""Stage-wise TPU profile of the detector hot path.

Times each sub-network (stems, stage1, stages 2-4, neck, head, decode+NMS,
depth, tracker) with a ``lax.scan`` of K iterations inside ONE jitted
program, so per-call tunnel latency (~28 ms polling quantum in this dev
environment) amortizes away and XLA cannot hoist the work out of the loop
(the input is perturbed by the loop carry each iteration).

Usage: python tools/utils/profile_detector.py [--streams 8] [--iters 20]
Only run ONE of these at a time (single-client TPU).
"""
from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def timed(fn, *args, iters=3):
    """Time fn via a host fetch of its scalar result: through the dev
    tunnel, block_until_ready alone does NOT reliably block — only a D2H
    value fetch does."""
    out = float(fn(*args))  # compile + settle
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def scan_timer(step_fn, n_iter):
    """Build a jitted fn running ``step_fn(params, x)`` n_iter times,
    defeating loop-invariant code motion by perturbing the input with the
    iteration counter. params/x are jit arguments (NOT closure constants:
    embedded weight constants blow past the remote-compile size limit)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run(params, x):
        def body(carry, _):
            i, acc = carry
            xi = jax.tree.map(lambda a: a + i.astype(a.dtype) * 1e-12, x)
            out = step_fn(params, xi)
            leaf = jax.tree.leaves(out)[0]
            return (i + 1, acc + leaf.astype(jnp.float32).mean()), None

        (_, acc), _ = lax.scan(body, (jnp.int32(0), jnp.float32(0)),
                               None, length=n_iter)
        return acc

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--streams', type=int, default=8)
    ap.add_argument('--height', type=int, default=1088)
    ap.add_argument('--width', type=int, default=1920)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import os
    if args.cpu:
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')
    import jax.numpy as jnp

    from stereotracking_tpu.models.csp_darknet import CSPDarknetDual
    from stereotracking_tpu.models.detector import (DetectorConfig,
                                                    YOLOXDetector)
    from stereotracking_tpu.models.layers import ConvBNAct, Focus, widen
    from stereotracking_tpu.models.pafpn import YOLOXPAFPN
    from stereotracking_tpu.models.yolox_head import YOLOXHeadModule

    S, H, W = args.streams, args.height, args.width
    if args.cpu:
        S, H, W = 2, 128, 160
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(np.random.RandomState(0).rand(S, H, W, 3), jnp.float32)
    disp = jnp.asarray(np.random.RandomState(1).rand(S, H, W, 3), jnp.float32)
    inputs = {'img': img, 'disp_postp': disp,
              'disp_mask': jnp.ones((S, H, W, 1), jnp.float32)}

    results = {}

    def bench(name, module, x):
        variables = module.init(rng, x, train=False)
        fn = lambda params, xi: module.apply(params, xi, train=False)
        run = scan_timer(fn, args.iters)
        dt, out = timed(run, variables, x)
        if os.environ.get('PROFILE_DEBUG'):
            print(f'  [debug] {name}: acc={float(out):.6f} '
                  f'raw_call={dt * 1e3:.2f} ms')
        per_frame = dt / args.iters / S * 1e3
        results[name] = per_frame
        print(f'{name:28s} {per_frame:8.3f} ms/frame '
              f'({dt / args.iters * 1e3:7.2f} ms/step x{S})')

    cfg = DetectorConfig()

    # full detector
    det = YOLOXDetector(cfg, dtype=dtype)
    bench('full detector fwd', det, inputs)

    # backbone only
    bb = CSPDarknetDual(cfg.deepen_factor, cfg.widen_factor, dtype=dtype)
    bench('backbone (dual)', bb, inputs)

    # stems only
    import flax.linen as fnn

    class Stems(fnn.Module):
        dtype: object = jnp.bfloat16

        @fnn.compact
        def __call__(self, x, train=False):
            a = Focus(widen(64, 0.5), dtype=self.dtype, name='stem')(
                x['img'], train)
            b = Focus(widen(64, 0.5), dtype=self.dtype, name='disp_stem')(
                x['disp_postp'], train)
            return a + b

    bench('2x Focus stems', Stems(dtype=dtype), inputs)

    # neck+head on fake pyramid
    hs, ws = H // 8, W // 8
    c = widen(1024, cfg.widen_factor)
    feats = tuple(
        jnp.asarray(np.random.RandomState(i).rand(
            S, hs // (2 ** i), ws // (2 ** i), ch), dtype)
        for i, ch in enumerate([c // 4, c // 2, c]))
    neck = YOLOXPAFPN(deepen_factor=cfg.deepen_factor,
                      widen_factor=cfg.widen_factor, dtype=dtype)
    bench('neck (PAFPN)', neck, feats)
    head = YOLOXHeadModule(num_classes=1, widen_factor=cfg.widen_factor,
                           dtype=dtype)
    bench('head', head, feats)

    print()
    known = sum(v for k, v in results.items()
                if k in ('backbone (dual)', 'neck (PAFPN)', 'head'))
    print(f'backbone+neck+head sum: {known:.3f} ms/frame; '
          f'full: {results.get("full detector fwd", float("nan")):.3f}')


if __name__ == '__main__':
    main()
