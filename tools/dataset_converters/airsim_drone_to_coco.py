#!/usr/bin/env python
"""Convert AirSim drone MOT annotations to COCO-VID json.

Capability of the reference converter
(/root/reference/tools/dataset_converters/AirSim_drone/convertAnnToCocoFormat.py:48-191):
per-sequence MOT txt rows ``frame,id,x,y,w,h,conf,X,Y,Z[,class]`` become
COCO-VID images/annotations with instance ids and 3D locations, skipping
NaN-depth rows and applying the area >= 30 and depth <= depth-range filters.
"""
import argparse
import json
import math
import os
import os.path as osp
from collections import defaultdict

from PIL import Image


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('data_root', help='root containing <seq>/left/*.png and '
                                     '<seq>/gt.txt')
    p.add_argument('output', help='output json path')
    p.add_argument('--depth-range', type=float, default=80.0)
    p.add_argument('--min-area', type=float, default=30.0)
    p.add_argument('--img-dir', default='left')
    p.add_argument('--gt-name', default='gt.txt')
    return p.parse_args()


def main():
    args = parse_args()
    sequences = sorted(
        d for d in os.listdir(args.data_root)
        if osp.isdir(osp.join(args.data_root, d, args.img_dir)))
    images, annotations, videos = [], [], []
    img_id, ann_id, global_ins = 1, 1, {}

    for vid, seq in enumerate(sequences, start=1):
        videos.append(dict(id=vid, name=seq))
        img_dir = osp.join(args.data_root, seq, args.img_dir)
        frames = sorted(f for f in os.listdir(img_dir)
                        if f.endswith('.png') or f.endswith('.jpg'))
        frame_to_id = {}
        for fi, fname in enumerate(frames):
            with Image.open(osp.join(img_dir, fname)) as im:
                w, h = im.size
            images.append(dict(
                id=img_id, video_id=vid, frame_id=fi,
                file_name=osp.join(seq, args.img_dir, fname),
                width=w, height=h))
            frame_to_id[fi + 1] = img_id  # MOT frames are 1-based
            img_id += 1

        gt_path = osp.join(args.data_root, seq, args.gt_name)
        if not osp.exists(gt_path):
            continue
        with open(gt_path) as f:
            for line in f:
                parts = line.strip().split(',')
                if len(parts) < 10:
                    continue
                frame, tid = int(float(parts[0])), int(float(parts[1]))
                x, y, bw, bh = map(float, parts[2:6])
                z = float(parts[9])
                if math.isnan(z) or z > args.depth_range:
                    continue
                if bw * bh < args.min_area:
                    continue
                if frame not in frame_to_id:
                    continue
                key = (vid, tid)
                if key not in global_ins:
                    global_ins[key] = len(global_ins) + 1
                annotations.append(dict(
                    id=ann_id, image_id=frame_to_id[frame], category_id=1,
                    bbox=[x, y, bw, bh], area=bw * bh, iscrowd=0,
                    instance_id=global_ins[key],
                    location=[float(parts[7]), float(parts[8]), z],
                    mot_conf=float(parts[6]),
                    visibility=1.0))
                ann_id += 1

    out = dict(images=images, annotations=annotations, videos=videos,
               categories=[dict(id=1, name='drone')])
    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    with open(args.output, 'w') as f:
        json.dump(out, f)
    print(f'{len(videos)} videos, {len(images)} images, '
          f'{len(annotations)} annotations -> {args.output}')


if __name__ == '__main__':
    main()
