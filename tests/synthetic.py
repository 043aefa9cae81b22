"""Synthetic stereo-scene generator shared by e2e tests and benchmarks.

Produces AirDrone-like frames: BGR uint8 left image, uint16 SGBM-style
fixed-point disparity (65535 = invalid), drone objects on linear paths with
known ground-truth boxes/ids/depths.
"""
import numpy as np

BASELINE, FOCAL = 0.25, 640.0


def depth_to_disp_u16(depth_m):
    return np.uint16(np.clip(np.round(BASELINE * FOCAL / depth_m * 16), 0,
                             65534))


class SyntheticSequence:
    def __init__(self, seed=0, h=360, w=640, n_obj=3, n_frames=20):
        rng = np.random.RandomState(seed)
        self.h, self.w, self.n_frames = h, w, n_frames
        self.objs = []
        for i in range(n_obj):
            self.objs.append(dict(
                x=rng.uniform(0.1 * w, 0.7 * w),
                y=rng.uniform(0.1 * h, 0.7 * h),
                vx=rng.uniform(-3, 3), vy=rng.uniform(-2, 2),
                w=rng.randint(14, 40), h=rng.randint(10, 30),
                depth=rng.uniform(8, 70),
                color=rng.randint(100, 255, 3)))

    def frame(self, t):
        img = np.full((self.h, self.w, 3), 60, np.uint8)
        disp = np.full((self.h, self.w), 65535, np.uint16)  # sky invalid
        gt = []
        # ground plane lower half
        gdepth = np.linspace(120, 20, self.h // 2)[:, None]
        disp[self.h // 2:] = depth_to_disp_u16(
            np.broadcast_to(gdepth, (self.h // 2, self.w)))
        img[self.h // 2:] = 90
        for oid, o in enumerate(self.objs):
            x = int(o['x'] + o['vx'] * t)
            y = int(o['y'] + o['vy'] * t)
            if x < 0 or y < 0 or x + o['w'] >= self.w or \
                    y + o['h'] >= self.h:
                continue
            img[y:y + o['h'], x:x + o['w']] = o['color']
            disp[y:y + o['h'], x:x + o['w']] = depth_to_disp_u16(o['depth'])
            gt.append(dict(id=oid, bbox=[x, y, x + o['w'], y + o['h']],
                           depth=o['depth']))
        return img, disp, gt
