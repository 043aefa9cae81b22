"""End-to-end benchmark: stereo frame-pairs/sec through the full MOT step.

Measures the flagship flow on the available accelerator (TPU under axon):
host->device upload of raw frames (uint8 BGR left image + uint16 disparity),
device preprocessing, bf16 dual-branch YOLOX-S forward at 1080p, bbox
decode + NMS, disparity->depth + per-box depth pooling, and the vectorized
OC-SORT association step — one jitted program per frame, state carried on
device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the driver's north-star 60 stereo pairs/sec/chip at 1080p
(BASELINE.md).
"""
import json
import sys
import time

import numpy as np


def make_frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for t in range(n):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        disp = np.full((h, w), 65535, np.uint16)
        # ground plane + a few objects with plausible disparities
        disp[h // 2:] = rng.randint(16, 1600, (h - h // 2, w), np.uint16)
        for _ in range(6):
            x, y = rng.randint(0, w - 60), rng.randint(0, h - 40)
            img[y:y + 30, x:x + 40] = rng.randint(100, 255, 3, np.uint8)
            disp[y:y + 30, x:x + 40] = rng.randint(40, 800)
        frames.append((img, disp))
    return frames


def main():
    import jax
    import jax.numpy as jnp

    from stereotracking_tpu.models.mot import MOTConfig, OCSORTDisparity
    from stereotracking_tpu.models.preprocessor import (padded_shape,
                                                        preprocess_frame)

    backend = jax.default_backend()
    on_accel = backend not in ('cpu',)
    h, w = (1080, 1920) if on_accel else (360, 640)
    oh, ow = padded_shape(h, w)
    n_frames = 60 if on_accel else 6

    model = OCSORTDisparity(MOTConfig(), dtype=jnp.bfloat16,
                            input_shape=(oh, ow))
    frames = make_frames(min(n_frames, 8), h, w)

    def run_frame(raw, t):
        img, disp = raw
        inputs = preprocess_frame(jnp.asarray(img), jnp.asarray(disp), oh, ow)
        return model.track(inputs, t)

    # warmup / compile
    res = run_frame(frames[0], 0)
    jax.block_until_ready(res)

    start = time.perf_counter()
    for t in range(1, n_frames + 1):
        res = run_frame(frames[t % len(frames)], t)
    jax.block_until_ready(res)
    elapsed = time.perf_counter() - start

    fps = n_frames / elapsed
    out = {
        'metric': f'stereo_pairs_per_sec_{h}p_e2e_track',
        'value': round(fps, 2),
        'unit': 'frames/sec',
        'vs_baseline': round(fps / 60.0, 3),
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
