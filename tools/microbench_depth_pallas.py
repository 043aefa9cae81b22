"""Real-chip A/B of the fused pallas depth kernel vs the XLA base path.

Production shapes (8 streams, tracker.num_dets boxes, MOTConfig crop,
1080p padded).  Checks numerical agreement on-device first (integer
outputs exact; f32 sums within reassociation ULPs), then times both with
the anti-hoisting scanned harness.

    python tools/microbench_depth_pallas.py
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

    from stereotracking_tpu.ops import depth as D
    from stereotracking_tpu.ops.depth_pallas import (
        extract_box_depths_disp_pallas)
    from stereotracking_tpu.models.mot import MOTConfig
    from stereotracking_tpu.models.preprocessor import padded_shape

    h, w = 1080, 1920
    n = 8
    cfg = MOTConfig()
    crop = cfg.depth_crop
    nd = cfg.tracker.num_dets
    oh, ow = padded_shape(h, w)

    rng = np.random.RandomState(0)
    disps = jnp.asarray(rng.randint(16, 1600, (n, oh, ow), np.int32)
                        .astype(np.float32) / 16.0)
    boxes = np.zeros((n, nd, 4), np.float32)
    boxes[..., :2] = rng.uniform(0, 900, (n, nd, 2))
    sizes = rng.uniform(8, 300, (n, nd, 2))
    boxes[..., 2:] = boxes[..., :2] + sizes
    boxes = jnp.asarray(boxes)
    bvalid = jnp.broadcast_to(jnp.arange(nd)[None, :] < (nd // 2), (n, nd))

    def batched(fn):
        def run(disps, boxes):
            return jax.vmap(lambda d, b, v: fn(
                d, b, v, cfg.baseline, cfg.focal_length, crop))(
                    disps, boxes, bvalid)
        return run

    base = batched(D.extract_box_depths_disp)
    pall = batched(extract_box_depths_disp_pallas)

    report = {'crop': crop, 'num_dets': nd, 'backend': jax.default_backend()}

    bd, bs = jax.device_get(jax.jit(base)(disps, boxes))
    pd, ps = jax.device_get(jax.jit(pall)(disps, boxes))
    report['invalid_match'] = bool(np.array_equal(bd == -1.0, pd == -1.0))
    rel = np.max(np.abs(pd - bd) / np.maximum(np.abs(bd), 1e-3))
    report['max_rel_err'] = float(rel)
    report['agree'] = bool(report['invalid_match'] and rel < 2e-5)

    report['base_ms'] = round(timed_scan(base, (disps, boxes),
                                         perturb=(0, 1)) * 1e3, 3)
    report['pallas_ms'] = round(timed_scan(pall, (disps, boxes),
                                           perturb=(0, 1)) * 1e3, 3)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
