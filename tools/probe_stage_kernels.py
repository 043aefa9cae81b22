"""Compile-and-run probe for the fused stage-1/stage-2 Pallas kernels at
serving shapes on the real chip.

Mosaic has op/dtype gaps that interpret mode does not surface (e.g. its
rotate op is 32-bit-only, which rejected ``pltpu.roll`` on bf16) — this
probe compiles each kernel standalone and runs it ONCE, so kernel-lowering
failures are isolated from the full serving bench.  Prints one JSON line.

Run alone on the chip:  python tools/probe_stage_kernels.py
"""
import json
import os
import sys

import numpy as np

if __name__ == '__main__' and not __package__:
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.models.mot import MOTConfig
    from stereotracking_tpu.models.preprocessor import padded_shape
    from stereotracking_tpu.ops.stage1_pallas import (stage1_dual_pallas,
                                                      stage1_fused_weights)
    from stereotracking_tpu.ops.stage2_pallas import (stage2_fold_pallas,
                                                      stage2_fused_weights)
    from stereotracking_tpu.ops.stem_pallas import pallas_stem_outputs
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    h, w = 1080, 1920
    oh, ow = padded_shape(h, w)
    cfg = MOTConfig()
    ms = MultiStreamTracker(cfg, n_streams=1, dtype=jnp.bfloat16,
                            input_shape=(oh, ow))
    bparams = ms.variables['params']['backbone']
    bstats = ms.variables['batch_stats']['backbone']
    interp = jax.default_backend() != 'tpu'

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    disp = rng.randint(16, 1600, (1, h, w), np.uint16)
    ip, dp = MultiStreamTracker.pack_frames(img, disp, oh, ow)

    out = {}
    so, dso = pallas_stem_outputs(bparams, bstats, jnp.asarray(ip[0]),
                                  jnp.asarray(dp[0]), ow // 4,
                                  interpret=interp)
    so = jax.block_until_ready(so)
    out['stems'] = 'ok'

    wts1 = stage1_fused_weights(bparams, bstats)
    y1 = jax.block_until_ready(
        stage1_dual_pallas(so, dso, wts1, interpret=interp))
    out['stage1'] = 'ok'
    out['y1_shape'] = list(y1.shape)
    out['y1_finite'] = bool(jnp.isfinite(y1.astype(jnp.float32)).all())

    wts2 = stage2_fused_weights(bparams, bstats)
    y2 = jax.block_until_ready(
        stage2_fold_pallas(y1, wts2, interpret=interp))
    out['stage2'] = 'ok'
    out['y2_shape'] = list(y2.shape)
    out['y2_finite'] = bool(jnp.isfinite(y2.astype(jnp.float32)).all())
    print(json.dumps(out))


if __name__ == '__main__':
    main()
