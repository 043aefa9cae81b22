"""Sub-op timings of stage1(dual, folded) + stage2 on the real chip.

Ranks the conv vs CSP-chain cost inside the 9.3 ms bb_s1_s2 slice
(tools/microbench_r3.py) to target a fused Pallas kernel.  Run alone:

    python tools/microbench_stage12.py
"""
import json
import os
import sys

import numpy as np

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

from perf_breakdown import timed_scan  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.models.layers import ConvBNAct, CSPLayer

    n = 8
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    report = {}

    def time_mod(name, mod, x, **kw):
        vs = mod.init(rng, x, **kw)

        def fwd(x):
            return mod.apply(vs, x, **kw)

        report[name] = timed_scan(fwd, (x,), perturb=0) * 1e3

    # stem activations, s2d(2) layout: (272, 480, 128)
    so = jnp.asarray(np.random.RandomState(0).randn(n, 272, 480, 128),
                     dtype)
    # stage1 stride conv: s2d2 in -> W-folded out (272, 240, 128)
    time_mod('s1_conv_ms', ConvBNAct(64, 3, strides=2, dtype=dtype), so,
             conv_mode='s2d2_in_fold_out')
    c0 = jnp.asarray(np.random.RandomState(1).randn(n, 272, 240, 128),
                     dtype)
    # stage1 CSP (1 block, folded)
    time_mod('s1_csp_ms', CSPLayer(64, 1, True, dtype=dtype), c0, fold=True)
    # stage2 stride conv: folded in -> standard out (136, 240, 128)
    time_mod('s2_conv_ms', ConvBNAct(128, 3, strides=2, dtype=dtype), c0,
             conv_mode='fold_consume')
    c1 = jnp.asarray(np.random.RandomState(2).randn(n, 136, 240, 128),
                     dtype)
    # stage2 CSP (3 blocks)
    time_mod('s2_csp_ms', CSPLayer(128, 3, True, dtype=dtype), c1)

    # individual CSP sub-ops at stage2 shape
    time_mod('s2_1x1_128_64_ms', ConvBNAct(64, 1, dtype=dtype), c1)
    c1h = jnp.asarray(np.random.RandomState(3).randn(n, 136, 240, 64),
                      dtype)
    time_mod('s2_3x3_64_64_ms', ConvBNAct(64, 3, dtype=dtype), c1h)
    # folded 3x3 at stage1 shape
    c0h = jnp.asarray(np.random.RandomState(4).randn(n, 272, 240, 64),
                      dtype)
    time_mod('s1_3x3_32_32_fold_ms', ConvBNAct(32, 3, dtype=dtype), c0h,
             conv_mode='fold')
    time_mod('s1_1x1_64_32_fold_ms', ConvBNAct(32, 1, dtype=dtype), c0h,
             conv_mode='fold')

    report = {k: round(v, 3) for k, v in report.items()}
    report['note'] = '8-stream batch, bf16, ms per batched step'
    print(json.dumps(report))


if __name__ == '__main__':
    main()
