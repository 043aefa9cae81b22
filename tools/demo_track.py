#!/usr/bin/env python
"""Streaming tracking demo: runs the per-frame API over a directory of
frames (left images + disparity maps) and writes visualizations.

Reference analog: demo usage of ``inference_mot`` (apis/inference.py).
"""
import argparse
import os
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('frames_dir', help='directory with left/*.png and '
                                      'disparity/*.png')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-dir', default='demo_out')
    p.add_argument('--max-frames', type=int, default=None)
    args = p.parse_args()

    from PIL import Image

    from stereotracking_tpu.apis.inference import inference_mot, init_model
    from stereotracking_tpu.data import transforms as T
    from stereotracking_tpu.visualization import TrackVisualizer

    left_dir = os.path.join(args.frames_dir, 'left')
    disp_dir = os.path.join(args.frames_dir, 'disparity')
    frames = sorted(os.listdir(left_dir))
    if args.max_frames:
        frames = frames[:args.max_frames]

    first = T.load_image(os.path.join(left_dir, frames[0]))
    h, w = first.shape[:2]
    oh = -(-h // 32) * 32
    ow = -(-w // 32) * 32
    model = init_model(args.config, args.checkpoint, input_shape=(oh, ow))
    vis = TrackVisualizer()
    os.makedirs(args.out_dir, exist_ok=True)

    for t, fname in enumerate(frames):
        img = T.load_image(os.path.join(left_dir, fname))
        disp = T.load_disparity(os.path.join(
            disp_dir, fname.replace('left', 'disparity')))
        res = inference_mot(model, img, disp, frame_id=t)
        ti = res['track_instances']
        frame_vis = vis.draw(img, ti['bboxes'], ti['instances_id'],
                             ti['scores'])
        Image.fromarray(frame_vis).save(
            os.path.join(args.out_dir, f'{t:06d}.jpg'))
        print(f'frame {t}: {len(ti["instances_id"])} tracks '
              f'ids={ti["instances_id"].tolist()}', flush=True)
    print(f'wrote visualizations to {args.out_dir}')


if __name__ == '__main__':
    main()
