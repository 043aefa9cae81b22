"""Roofline probe: what the chip actually achieves on stage-2-shaped work.

Compares, at the stage-2 activation shape (8, 136, 240, C):
  matmul_eq     — the same FLOPs as a 1x1 conv, as one big (N, C) @ (C, C)
  conv1x1       — lax 1x1 conv (NHWC)
  conv3x3       — lax 3x3 conv
  conv3x3_dot   — 3x3 as 9 shifted (N, C) @ (C, C) dots (im2col-free)
  csp_chain     — 3x (1x1 -> 3x3) residual chain, lax convs
  csp_chain_dot — same chain with every conv as shifted dots

All timed with the anti-hoisting scanned harness.  Run alone on the chip:
    python tools/exp_conv_roofline.py
"""
import json
import os
import sys

import numpy as np

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
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

    n, h, w, c = 8, 136, 240, 128
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), dtype)
    w1 = jnp.asarray(rng.randn(c, c) * 0.05, dtype)
    w3 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, dtype)
    wh1 = jnp.asarray(rng.randn(c, c // 2) * 0.05, dtype)
    w3h = jnp.asarray(rng.randn(3, 3, c // 2, c // 2) * 0.02, dtype)
    wh2 = jnp.asarray(rng.randn(c // 2, c) * 0.05, dtype)

    report = {}
    flops_1x1 = 2 * n * h * w * c * c

    def t(name, fn, args, flops):
        ms = timed_scan(fn, args, perturb=0) * 1e3
        report[name + '_ms'] = round(ms, 3)
        report[name + '_tflops'] = round(flops / (ms * 1e-3) / 1e12, 1)

    t('matmul_eq', lambda x: (x.reshape(-1, c) @ w1), (x,), flops_1x1)

    def conv(x, k, stride=1):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.bfloat16)

    t('conv1x1', lambda x: conv(x, w1[None, None]), (x,), flops_1x1)
    t('conv3x3', lambda x: conv(x, w3), (x,), flops_1x1 * 9)

    def conv3x3_dot(x, k):
        # 3x3 as 9 shifted dots accumulated in f32
        acc = jnp.zeros(x.shape[:-1] + (k.shape[-1],), jnp.float32)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2]]
                acc += (xs.reshape(-1, k.shape[2]) @ k[dy, dx]
                        ).reshape(acc.shape).astype(jnp.float32)
        return acc.astype(x.dtype)

    t('conv3x3_dot', lambda x: conv3x3_dot(x, w3), (x,), flops_1x1 * 9)

    def csp_chain(x):
        y = x
        for _ in range(3):
            a = jax.nn.silu(conv(y, wh1[None, None]))
            b = jax.nn.silu(conv(a, w3h))
            y = y + conv(b, wh2[None, None])
        return y

    def csp_chain_dot(x):
        y = x
        for _ in range(3):
            a = jax.nn.silu((y.reshape(-1, c) @ wh1).reshape(
                n, h, w, c // 2))
            b = jax.nn.silu(conv3x3_dot(a, w3h))
            y = y + (b.reshape(-1, c // 2) @ wh2).reshape(n, h, w, c)
        return y

    chain_flops = 3 * (flops_1x1 // 2 + flops_1x1 // 4 * 9 + flops_1x1 // 2)
    t('csp_chain', csp_chain, (x,), chain_flops)
    t('csp_chain_dot', csp_chain_dot, (x,), chain_flops)

    report['note'] = f'({n},{h},{w},{c}) bf16; v5e bf16 peak ~197 TFLOPS'
    print(json.dumps(report))


if __name__ == '__main__':
    main()
