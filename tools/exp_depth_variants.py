"""Scratch experiment: exact-equivalent reformulations of the depth slice.

Variants measured on the chip (8 streams, 64 boxes, crop 96, 1080p):
  base      — production extract_box_depths_disp (ops/depth.py:121)
  i16       — int16 pyramid storage (order-preserving -32768 shift),
              lane-aligned buffer width, sublane-aligned level offsets
  i16_unr   — i16 + fully unrolled 16-step bisection
  i16_nolv  — i16_unr with 2 pyramid levels instead of 4 (coverage check
              only; NOT exact for boxes > 192 px)

    python tools/exp_depth_variants.py
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


def make_variant(levels=4, unroll=True):
    import jax
    import jax.numpy as jnp
    from stereotracking_tpu.ops import depth as D

    def _build_pyramid_i16(raw, crop):
        h, w = raw.shape
        x = (raw - 32768).astype(jnp.int16)
        bw = -(-(w + crop + 2) // 128) * 128
        rows, offsets, off = [], [], 0
        for lv in range(levels):
            v = x[:: 2 ** lv, :: 2 ** lv]
            lh, lw = v.shape
            ph = -(-(lh + crop + 2) // 8) * 8
            rows.append(jnp.pad(v, ((0, ph - lh), (0, bw - lw)),
                                constant_values=np.int16(-32768)))
            offsets.append(off)
            off += ph
        return jnp.concatenate(rows, axis=0), tuple(offsets)

    def _ranks16(vals, valid, ranks):
        R = ranks.shape[0]
        lo = jnp.zeros((R,), jnp.int32)
        hi = jnp.full((R,), 65535, jnp.int32)

        def body(i, lh):
            lo, hi = lh
            mid = lo + (hi - lo + 1) // 2
            cnt = jnp.sum(valid[None, :] & (vals[None, :] >= mid[:, None]),
                          axis=1)
            ge = cnt >= ranks + 1
            return (jnp.where(ge, mid, lo), jnp.where(ge, hi, mid - 1))

        if unroll:
            lh = (lo, hi)
            for i in range(16):
                lh = body(i, lh)
            lo, hi = lh
        else:
            lo, hi = jax.lax.fori_loop(0, 16, body, (lo, hi))
        return lo

    def extract(disp, bboxes, valid, baseline, focal_length, crop):
        h, w = disp.shape
        raw32 = jnp.round(disp * 16.0).astype(jnp.int32)
        pyr16, offsets = _build_pyramid_i16(raw32, crop)
        offsets = jnp.asarray(offsets, jnp.int32)
        pw = pyr16.shape[1]
        raw_pad16 = pyr16[:h + crop + 2]
        bf = baseline * focal_length

        def f_depth(r):
            return bf / (r.astype(jnp.float32) / 16.0 + 1e-6)

        def per_box(box, is_valid):
            x1 = jnp.int32(box[0]); y1 = jnp.int32(box[1])
            x2 = jnp.int32(box[2]); y2 = jnp.int32(box[3])
            bw_ = x2 - x1; bh = y2 - y1
            degenerate = (x1 < 0) | (y1 < 0) | (bw_ <= 0) | (bh <= 0) | \
                (box[0] >= w) | (box[1] >= h)
            skip = jnp.logical_not(is_valid) | degenerate | \
                (bw_.astype(jnp.float32) > D.MAX_BOX_W)

            size = jnp.maximum(bw_, bh)
            level = jnp.clip(
                jnp.ceil(jnp.log2(jnp.maximum(
                    size.astype(jnp.float32) / crop, 1.0))).astype(jnp.int32),
                0, levels - 1)
            stride = jnp.int32(1) << level
            oy = offsets[level] + jnp.clip(y1, 0, h) // stride
            ox = jnp.clip(x1, 0, w) // stride
            win = jax.lax.dynamic_slice(pyr16, (oy, ox), (crop, crop))
            rvals = win.astype(jnp.int32) + 32768

            rr = jnp.arange(crop, dtype=jnp.int32)
            in_box = ((rr * stride) < bh)[:, None] & \
                     ((rr * stride) < bw_)[None, :]
            rvals = jnp.where(in_box, rvals, 0).reshape(-1)
            dvals = f_depth(rvals)
            ok = in_box.reshape(-1) & (dvals > 0.0) & (dvals < D.MAX_DEPTH)
            n = jnp.sum(ok, dtype=jnp.int32)

            nf = n.astype(jnp.float32)
            cand_ws = jnp.stack([(0.4 * nf).astype(jnp.int32),
                                 (0.25 * nf).astype(jnp.int32),
                                 jnp.int32(0)])
            cand_we = jnp.stack([
                (0.4 * nf + 0.6 * nf).astype(jnp.int32),
                (0.25 * nf + 0.6 * nf).astype(jnp.int32),
                (0.6 * nf).astype(jnp.int32)])
            m_fb = jnp.maximum(jnp.where(n > 1, n - 1, n), 1)
            ranks = jnp.concatenate([
                jnp.maximum(n // 2, 0)[None],
                jnp.maximum(cand_we, 1) - 1,
                jnp.maximum(cand_ws, 1) - 1,
                m_fb[None] - 1])
            r_raw = _ranks16(rvals, ok, ranks)
            r_vals = f_depth(r_raw)
            d_mid = r_vals[0]

            cy1 = jnp.clip(y1, 0, h + crop)
            cy2 = jnp.clip(y2 - 2, 0, h + crop)
            cx1 = jnp.clip(x1, 0, pw - 2)
            cx2 = jnp.clip(x2 - 2, 0, pw - 2)

            def corner(y, x):
                v16 = jax.lax.dynamic_slice(raw_pad16, (y, x), (2, 2))
                vals = f_depth(v16.astype(jnp.int32) + 32768)
                dy = jnp.arange(2)[:, None]
                dx = jnp.arange(2)[None, :]
                inside = ((y + dy) < h) & ((x + dx) < w)
                return jnp.mean(jnp.where(inside, vals, 0.0))

            corners = jnp.stack([corner(cy1, cx1), corner(cy1, cx2),
                                 corner(cy2, cx1), corner(cy2, cx2)])
            votes = jnp.sum(corners > d_mid)
            branch = jnp.where(votes <= 2, 0, jnp.where(votes == 3, 1, 2))

            ms = jnp.maximum(jnp.concatenate(
                [cand_we, cand_ws, m_fb[None]]), 1)
            v_raw = r_raw[1:]
            vs = r_vals[1:]
            below = ok[None, :] & (rvals[None, :] > v_raw[:, None])
            cnt_lt = jnp.sum(below, axis=1, dtype=jnp.int32)
            sum_lt = jnp.sum(jnp.where(below, dvals[None, :], 0.0), axis=1)
            pref = sum_lt + (ms - cnt_lt).astype(jnp.float32) * vs

            ws = cand_ws[branch]
            we = cand_we[branch]
            seg_cnt = (we - ws).astype(jnp.float32)
            seg_sum = jnp.where(we > ws, pref[branch], 0.0) - \
                jnp.where(ws > 0, pref[3 + branch], 0.0)
            fb_cnt = jnp.maximum(n - 1, 1).astype(jnp.float32)
            fb_sum = pref[6]
            use_fb = we <= ws
            d = jnp.where(use_fb, fb_sum / fb_cnt,
                          seg_sum / jnp.maximum(seg_cnt, 1.0))
            no_pixels = n < 1
            bad = skip | no_pixels
            d = jnp.where(bad, -1.0, d)
            scale = jnp.where(bad, 1.0, jnp.clip(d * d, 1.0, 3.0))
            return d, scale

        return jax.vmap(per_box)(bboxes, valid)

    return extract


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

    def batched(fn):
        def run(disps, boxes):
            return jax.vmap(lambda d, b, v: fn(
                d, b, v, cfg.baseline, cfg.focal_length, crop))(
                    disps, boxes, bvalid)
        return run

    base = batched(lambda d, b, v, bl, fl, c: D.extract_box_depths_disp(
        d, b, v, bl, fl, c))
    report['base_ms'] = timed_scan(base, (disps, boxes),
                                   perturb=(0, 1)) * 1e3

    variants = {
        'i16_loop': make_variant(levels=4, unroll=False),
        'i16_unroll': make_variant(levels=4, unroll=True),
        'i16_unroll_lv2': make_variant(levels=2, unroll=True),
    }
    ref_d, ref_s = jax.device_get(base(disps, boxes))
    for name, fn in variants.items():
        run = batched(fn)
        gd, gs = jax.device_get(run(disps, boxes))
        exact = bool(np.array_equal(gd, ref_d) and np.array_equal(gs, ref_s))
        report[name + '_ms'] = timed_scan(run, (disps, boxes),
                                          perturb=(0, 1)) * 1e3
        report[name + '_exact'] = exact

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in report.items()}))


if __name__ == '__main__':
    main()
