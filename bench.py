"""End-to-end benchmark: stereo frame-pairs/sec/chip through the MOT step.

Flagship configuration (BASELINE config 5): 8 concurrent 1080p streams
batched through one jitted per-frame program on a single chip — bf16
dual-branch YOLOX-S forward, bbox decode + NMS, disparity->depth + per-box
depth pooling, depth^2 box inflation and the vectorized OC-SORT association,
with per-stream track state carried on device.

RAW frames (uint8 image + uint16 disparity, as decoded) are pre-staged in
HBM and cycled: the metric is per-chip compute throughput (production
systems DMA camera frames at >10 GB/s; this dev environment's TPU tunnel
moves ~100 MB/s and would measure the tunnel, not the chip).  The
device-side preprocessing (cast, invalid-pixel mask, /16 fixed point,
pad-to-divisor) runs INSIDE the timed per-frame program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; baseline
is the driver's north-star 60 stereo pairs/sec/chip at 1080p (BASELINE.md).
"""
import json
import time

import numpy as np


def make_frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for _ in range(n):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        disp = np.full((h, w), 65535, np.uint16)
        disp[h // 2:] = rng.randint(16, 1600, (h - h // 2, w), np.uint16)
        for _ in range(6):
            x, y = rng.randint(0, w - 60), rng.randint(0, h - 40)
            img[y:y + 30, x:x + 40] = rng.randint(100, 255, 3, np.uint8)
            disp[y:y + 30, x:x + 40] = rng.randint(40, 800)
        frames.append((img, disp))
    return frames


def tpu_responsive(timeout_s: float = 240.0, attempts: int = 3) -> bool:
    """Probe the accelerator in a subprocess: a wedged TPU session hangs
    forever on the first op and cannot be interrupted in-process.

    Retries: the dev tunnel occasionally takes minutes to grant a session
    right after another client released it — a transient that must not be
    mistaken for a wedge (it cost two bench runs a CPU fallback). The
    timeout must also absorb a saturated host: with all cores busy the
    probe's interpreter+import+grant alone measured >100 s."""
    import subprocess
    import sys
    code = ('import jax, jax.numpy as jnp;'
            'print(float((jnp.ones((8,8)) @ jnp.ones((8,8)))[0,0]))')
    for attempt in range(attempts):
        try:
            r = subprocess.run([sys.executable, '-c', code],
                               timeout=timeout_s,
                               capture_output=True, text=True)
            if r.returncode == 0 and '8.0' in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < attempts - 1:
            time.sleep(20)
    return False


def main():
    import os

    # Probe BEFORE this process initializes any backend: a subprocess probe
    # issued after the parent claims the (single-client) TPU would queue
    # behind it and always time out.
    want_tpu = os.environ.get('JAX_PLATFORMS', 'cpu') not in ('cpu', '')
    if want_tpu and os.environ.get('_BENCH_CPU_FALLBACK') != '1' \
            and not tpu_responsive():
        # accelerator wedged: restart on a clean CPU interpreter (axon
        # registration skipped entirely) so the driver still gets a line
        import sys
        env = dict(os.environ, JAX_PLATFORMS='cpu', _BENCH_CPU_FALLBACK='1')
        env.pop('PALLAS_AXON_POOL_IPS', None)
        os.execve(sys.executable, [sys.executable, __file__], env)

    import jax
    if os.environ.get('_BENCH_CPU_FALLBACK') == '1':
        # env alone is not enough: jax may be pre-imported with the axon
        # platform registered by sitecustomize
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from stereotracking_tpu.models.preprocessor import padded_shape
    from stereotracking_tpu.parallel.multistream import MultiStreamTracker

    backend = jax.default_backend()
    on_accel = backend not in ('cpu',)
    h, w = (1080, 1920) if on_accel else (120, 160)
    n_streams = int(os.environ.get("BENCH_STREAMS", "8")) if on_accel else 2
    n_steps = 30 if on_accel else 3
    oh, ow = padded_shape(h, w)

    # the bench runs the same config surface users do (VERDICT r3 #1): the
    # serving kernels are selected by the model dict's stem_backend /
    # depth_backend keys ('auto' = pallas on real TPU, as in the flagship
    # config); BENCH_DEPTH/BENCH_STEM=xla revert for A/B runs
    from stereotracking_tpu.apis.builder import build_mot_config
    # reuse_det_depth=False matches the flagship parity config
    # (configs/.../yolox_s_airdrone_disp.py:29): the reference re-extracts
    # depth on the un-inflated track boxes (ocsort_disparity.py:100-104),
    # so the headline pays that work too (VERDICT r4 weak #4).
    reuse_depth = os.environ.get('BENCH_REUSE_DEPTH', '0') == '1'
    cfg = build_mot_config({
        'type': 'OCSORT_Disparity',
        'reuse_det_depth': reuse_depth,
        'depth_backend': os.environ.get('BENCH_DEPTH', 'auto'),
        'stem_backend': os.environ.get('BENCH_STEM', 'auto'),
        'stage1_backend': os.environ.get('BENCH_STAGE1', 'auto'),
        'stage2_backend': os.environ.get('BENCH_STAGE2', 'auto'),
        'stage3_backend': os.environ.get('BENCH_STAGE3', 'auto'),
        # 'auto' = pack raw frames ON DEVICE (MXU selection matmuls) on
        # real TPU: zero host-side layout work per frame, so sustained ==
        # device rate even on a 1-core host.  BENCH_PACK=host restores the
        # C++ SIMD loader pack for A/B.
        'pack_backend': os.environ.get('BENCH_PACK', 'auto'),
    })
    quant = os.environ.get('BENCH_QUANT')  # '' | 'int8' | 'sim8'
    if quant:
        cfg = cfg._replace(detector=cfg.detector._replace(quant=quant))
    ms = MultiStreamTracker(cfg, n_streams=n_streams,
                            dtype=jnp.bfloat16, input_shape=(oh, ow))

    # pre-stage 4 distinct RAW frame-sets per stream in HBM (uint8 + uint16,
    # exactly what a production DMA delivers); preprocessing happens inside
    # the timed step.  BENCH_STEM=pallas (default on accelerator) also
    # stages the host-packed stem layout (csrc/stem_pack.cpp — the data
    # loader's layout step, like the reference's host-side mmcv pipeline);
    # host pack throughput is reported separately as pack_ms_per_pair.
    stem_mode = cfg.stem_backend
    pack_host = stem_mode == 'pallas' and cfg.pack_backend == 'host'
    staged = []
    raw_sets = []          # host-side raw frames for the sustained loop
    for t in range(4):
        imgs, disps = [], []
        for s in range(n_streams):
            img, disp = make_frames(1, h, w, seed=t * 97 + s)[0]
            imgs.append(img)
            disps.append(disp)
        imgs, disps = np.stack(imgs), np.stack(disps)
        raw_sets.append((imgs, disps))
        entry = [jax.block_until_ready(jnp.asarray(imgs)),
                 jax.block_until_ready(jnp.asarray(disps))]
        if pack_host:
            ip, dp = MultiStreamTracker.pack_frames(imgs, disps, oh, ow)
            entry += [jax.block_until_ready(jnp.asarray(ip)),
                      jax.block_until_ready(jnp.asarray(dp))]
        staged.append(tuple(entry))

    def step_fn(entry, fids):
        if pack_host:
            return ms.track_packed(entry[0], entry[1], entry[2], entry[3],
                                   fids)
        return ms.track_raw(entry[0], entry[1], fids)

    # chunked serving shape: T frames per device program (lax.scan over
    # the per-frame step) — amortizes the fixed per-dispatch launch cost
    chunk = int(os.environ.get('BENCH_CHUNK', '1')) if on_accel else 1

    # warmup / compile (frame 0 resets + main path)
    if chunk > 1:
        chunked = [jnp.stack([staged[t % len(staged)][i]
                              for t in range(chunk)])
                   for i in range(len(staged[0]))]

        def run_chunk(t0):
            fids = jnp.asarray([[t0 + k] * n_streams
                                for k in range(chunk)], jnp.int32)
            if pack_host:
                return ms.track_packed_chunk(*chunked, fids)
            return ms.track_raw_chunk(chunked[0], chunked[1], fids)

        res = run_chunk(0)
        # value fetch: through the dev tunnel block_until_ready can return
        # before device completion (see the D2H note in the timed loop) —
        # a leftover warmup would otherwise drain inside the timed window
        _ = float(np.asarray(res.track_valid).sum())
    else:
        res = step_fn(staged[0], [0] * n_streams)
        res = step_fn(staged[1], [1] * n_streams)
        _ = float(np.asarray(res.track_valid).sum())

    # optional profiler trace (SURVEY.md section 5: jax.profiler wiring);
    # BENCH_PROFILE=<dir> writes an xplane trace of the timed loop
    import contextlib
    profile_dir = os.environ.get('BENCH_PROFILE')
    trace_cm = (jax.profiler.trace(profile_dir) if profile_dir
                else contextlib.nullcontext())

    start = time.perf_counter()
    with trace_cm:
        if chunk > 1:
            n_disp = max(1, n_steps // chunk)
            for d in range(n_disp):
                res = run_chunk(2 + d * chunk)
            n_frames = n_disp * chunk
        else:
            for t in range(2, n_steps + 2):
                res = step_fn(staged[t % len(staged)], [t] * n_streams)
            n_frames = n_steps
        # D2H fetch: through the dev tunnel block_until_ready alone does not
        # reliably block until device completion, a value fetch does.
        _ = float(np.asarray(res.track_valid).sum())
    elapsed = time.perf_counter() - start

    fps = n_frames * n_streams / elapsed
    import os as _os
    name = f'stereo_pairs_per_sec_per_chip_{h}p_{n_streams}streams'
    if chunk > 1:
        name += f'_chunk{chunk}'
    if quant:
        name += f'_{quant}'
    if _os.environ.get('_BENCH_CPU_FALLBACK') == '1':
        name += '_TPU_WEDGED_cpu_fallback'
    out = {
        'metric': name,
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / 60.0, 3),
        'reuse_det_depth': reuse_depth,
        'pack_backend': cfg.pack_backend if stem_mode == 'pallas' else None,
    }
    if stem_mode == 'pallas' and not pack_host:
        # device-side pack: the per-frame program already contains the pack
        # (MXU selection matmuls), so the loop above IS the sustained rate —
        # the host does nothing per frame but dispatch.  Measure it again
        # as the sustained field so the two numbers are independent runs.
        res = step_fn(staged[0], [0] * n_streams)
        t0 = time.perf_counter()
        for t in range(n_steps):
            res = step_fn(staged[t % len(staged)], [t + 2] * n_streams)
        _ = float(np.asarray(res.track_valid).sum())
        wall = time.perf_counter() - t0
        out['sustained_incl_host_pack'] = round(
            n_steps * n_streams / wall, 2)
        out['host_pack_share_of_wall'] = 0.0
    if pack_host:
        # host data-loader layout cost: warm, into preallocated buffers,
        # device idle — the isolated per-pair pack cost (the SIMD batch
        # packer, csrc/stem_pack.cpp).  Median of 10 single-set reps (the
        # r4 3-rep mean was inconsistent with the sustained loop,
        # VERDICT r4 weak #5 — per-rep medians + the in-situ timing below
        # make the two measurements reconcilable).
        bi0 = np.empty(staged[0][2].shape, np.uint8)
        bd0 = np.empty(staged[0][3].shape, np.uint16)
        MultiStreamTracker.pack_frames(*raw_sets[0], oh, ow,
                                       out_img=bi0, out_disp=bd0)
        reps = []
        for r in range(10):
            t0 = time.perf_counter()
            MultiStreamTracker.pack_frames(*raw_sets[r % len(raw_sets)],
                                           oh, ow, out_img=bi0, out_disp=bd0)
            reps.append((time.perf_counter() - t0) / n_streams * 1e3)
        out['host_pack_ms_per_pair'] = round(float(np.median(reps)), 2)
        out['host_pack_ms_per_pair_min'] = round(float(np.min(reps)), 2)

        # pack scaling vs host cores (how many cores one chip's streams
        # need): restrict affinity to 1/2/4 cores where available
        try:
            full = os.sched_getaffinity(0)
            cores = sorted(full)
            scaling = {}
            for nc in (1, 2, 4):
                if nc > len(cores):
                    break
                os.sched_setaffinity(0, set(cores[:nc]))
                MultiStreamTracker.pack_frames(*raw_sets[0], oh, ow,
                                               out_img=bi0, out_disp=bd0)
                ts = []
                for r in range(5):
                    t0 = time.perf_counter()
                    MultiStreamTracker.pack_frames(
                        *raw_sets[r % len(raw_sets)], oh, ow,
                        out_img=bi0, out_disp=bd0)
                    ts.append((time.perf_counter() - t0) / n_streams * 1e3)
                scaling[str(nc)] = round(float(np.median(ts)), 2)
            os.sched_setaffinity(0, full)
            if len(scaling) > 1:
                out['host_pack_ms_per_pair_by_cores'] = scaling
        except (AttributeError, OSError):
            pass

        # SUSTAINED serving rate (VERDICT r3 #2): the wall clock of this
        # loop includes the host stem-pack of EVERY frame-set consumed,
        # overlapped with device compute through async dispatch — enqueue
        # step t (non-blocking), pack frame-set t+1 into reused buffers
        # while the device works.  H2D of the packed bytes is excluded:
        # the dev tunnel moves ~100 MB/s and would measure the tunnel, not
        # the server (production DMA >10 GB/s per the deployment target);
        # the packing WORK races the device for the same wall clock, which
        # is the contention a real pipelined server sees.
        bi, bd = bi0, bd0
        n_sust = n_steps
        pack_ts = []       # per-pack in-situ seconds (device queue busy)

        def timed_pack(im, dp_):
            t0 = time.perf_counter()
            MultiStreamTracker.pack_frames(im, dp_, oh, ow,
                                           out_img=bi, out_disp=bd)
            pack_ts.append(time.perf_counter() - t0)

        if chunk > 1:
            # chunked sustained serving: one device program per `chunk`
            # frames (fewer dispatches contending with the packer for the
            # host core); every frame consumed still pays one host pack
            # inside the wall clock
            res = run_chunk(0)                     # re-warm frame path
            jax.block_until_ready(res)
            n_disp = max(1, n_sust // chunk)
            t0 = time.perf_counter()
            for d in range(n_disp):
                res = run_chunk(2 + d * chunk)
                for k in range(chunk):
                    im, dp_ = raw_sets[(d * chunk + k) % len(raw_sets)]
                    timed_pack(im, dp_)
            _ = float(np.asarray(res.track_valid).sum())
            wall = time.perf_counter() - t0
            sust = n_disp * chunk * n_streams / wall
        else:
            res = step_fn(staged[0], [0] * n_streams)  # re-warm frame path
            t0 = time.perf_counter()
            for t in range(n_sust):
                res = step_fn(staged[t % len(staged)], [t + 2] * n_streams)
                im, dp_ = raw_sets[(t + 1) % len(raw_sets)]
                timed_pack(im, dp_)
            _ = float(np.asarray(res.track_valid).sum())
            wall = time.perf_counter() - t0
            sust = n_sust * n_streams / wall
        out['sustained_incl_host_pack'] = round(sust, 2)
        # in-situ pack cost (measured inside the sustained wall clock, so
        # the isolated and sustained numbers are mutually checkable:
        # sum(pack) <= wall by construction) and the host-core budget one
        # chip's streams need: pack-time share of the serving wall clock
        out['host_pack_ms_per_pair_insitu'] = round(
            float(np.median(pack_ts)) / n_streams * 1e3, 2)
        out['host_pack_share_of_wall'] = round(float(np.sum(pack_ts)) / wall,
                                               3)
        try:
            out['host_cores'] = len(os.sched_getaffinity(0))
        except AttributeError:
            out['host_cores'] = os.cpu_count()
    print(json.dumps(out))


if __name__ == '__main__':
    main()
