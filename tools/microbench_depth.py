"""Sub-slice timings of the integer-domain depth extraction on the chip.

Splits extract_box_depths_disp (ops/depth.py:123) into pyramid build /
window gather / bisection / suffix passes to rank where the ~14 ms
isolated slice (tools/microbench_r3.py depth_path_ms) actually goes.

    python tools/microbench_depth.py
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

    jax.config.update('jax_compilation_cache_dir',
                      '/root/.cache/jax_compilation')

    from stereotracking_tpu.ops import depth as D
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
    boxes = jnp.asarray(rng.uniform(0, 900, (n, nd, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 48.0)
    bvalid = jnp.broadcast_to(jnp.arange(nd)[None, :] < (nd // 2), (n, nd))

    report = {}

    # full production call
    def full(disps, boxes):
        return jax.vmap(lambda d, b, v: D.extract_box_depths_disp(
            d, b, v, cfg.baseline, cfg.focal_length, crop))(
                disps, boxes, bvalid)
    report['full_ms'] = timed_scan(full, (disps, boxes),
                                   perturb=(0, 1)) * 1e3

    # (a) int cast + pyramid build only
    def pyr_only(disps):
        def one(d):
            raw = jnp.round(d * 16.0).astype(jnp.int32)
            pyr, _ = D._build_pyramid(raw, crop)
            return pyr
        return jax.vmap(one)(disps)
    report['pyramid_ms'] = timed_scan(pyr_only, (disps,), perturb=0) * 1e3

    # precompute pyramids once for the window/bisect slices
    def mk(d):
        raw = jnp.round(d * 16.0).astype(jnp.int32)
        pyr, offs = D._build_pyramid(raw, crop)
        return pyr
    pyrs = jax.vmap(mk)(disps)
    _, offsets = D._build_pyramid(jnp.zeros((oh, ow), jnp.int32), crop)
    offsets = jnp.asarray(offsets, jnp.int32)

    # (b) window gather (vmapped dynamic_slice from the HBM pyramid)
    def windows(pyr, bx):
        def one(p, bxs):
            def per_box(box):
                x1 = jnp.int32(box[0]); y1 = jnp.int32(box[1])
                x2 = jnp.int32(box[2]); y2 = jnp.int32(box[3])
                size = jnp.maximum(x2 - x1, y2 - y1)
                level = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(
                    size.astype(jnp.float32) / crop, 1.0))).astype(jnp.int32),
                    0, D._PYR_LEVELS - 1)
                stride = jnp.int32(1) << level
                oy = offsets[level] + jnp.clip(y1, 0, oh) // stride
                ox = jnp.clip(x1, 0, ow) // stride
                return jax.lax.dynamic_slice(p, (oy, ox), (crop, crop))
            return jax.vmap(per_box)(bxs)
        return jax.vmap(one)(pyr, bx)
    report['window_gather_ms'] = timed_scan(windows, (pyrs, boxes),
                                            perturb=(0, 1)) * 1e3

    wins = windows(pyrs, boxes)  # (n, nd, crop, crop)

    # (c) bisection only (8 ranks, 16 steps) on pre-gathered windows
    def bisect(wins):
        def one(win):
            rvals = win.reshape(-1)
            ok = (rvals > 0) & (rvals < 65536)
            nn = jnp.sum(ok, dtype=jnp.int32)
            ranks = jnp.stack([nn // 2, nn // 4, nn // 3, nn // 5,
                               nn // 6, nn // 7, nn // 8, nn - 1])
            return D._value_at_ranks_desc16(rvals, ok, ranks)
        return jax.vmap(jax.vmap(one))(wins)
    report['bisect_ms'] = timed_scan(bisect, (wins,), perturb=0) * 1e3

    # (d) suffix passes: masked counts/sums below 7 thresholds
    def suffix(wins):
        def one(win):
            rvals = win.reshape(-1)
            ok = (rvals > 0) & (rvals < 65536)
            thr = jnp.arange(7, dtype=jnp.int32) * 1000 + 100
            below = ok[None, :] & (rvals[None, :] > thr[:, None])
            cnt = jnp.sum(below, axis=1, dtype=jnp.int32)
            sm = jnp.sum(jnp.where(below, rvals[None, :].astype(jnp.float32),
                                   0.0), axis=1)
            return cnt, sm
        return jax.vmap(jax.vmap(one))(wins)
    report['suffix_ms'] = timed_scan(suffix, (wins,), perturb=0) * 1e3

    report = {k: round(v, 3) for k, v in report.items()}
    report['note'] = (f'{n} streams, {nd} boxes, crop {crop}; '
                      'ms per batched step')
    print(json.dumps(report))


if __name__ == '__main__':
    main()
