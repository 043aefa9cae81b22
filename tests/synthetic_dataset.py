"""Write a synthetic AirDrone-style dataset to disk (COCO-VID + PNGs)."""
import json
import os

import numpy as np
from PIL import Image

from synthetic import SyntheticSequence


def write_airdrone_dataset(root, n_videos=2, n_frames=5, h=120, w=160):
    os.makedirs(root, exist_ok=True)
    images, annotations, videos = [], [], []
    img_id, ann_id = 1, 1
    for v in range(n_videos):
        videos.append(dict(id=v + 1, name=f'seq{v:02d}'))
        seq = SyntheticSequence(seed=v, h=h, w=w, n_obj=2,
                                n_frames=n_frames)
        for t in range(n_frames):
            img, disp, gt = seq.frame(t)
            rel = f'airsim/seq{v:02d}/left/{t:06d}_left.png'
            path = os.path.join(root, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(img[:, :, ::-1]).save(path)  # save as RGB
            ddir = path.replace('left', 'disparity')
            os.makedirs(os.path.dirname(ddir), exist_ok=True)
            Image.fromarray(disp.astype(np.uint16)).save(ddir)
            pdir = path.replace('left', 'depth')
            os.makedirs(os.path.dirname(pdir), exist_ok=True)
            depth_cm = np.full((h, w), 20000, np.int32)
            Image.fromarray(depth_cm.astype(np.uint16)).save(pdir)
            images.append(dict(
                id=img_id, file_name=rel, width=w, height=h,
                video_id=v + 1, frame_id=t))
            for obj in gt:
                x1, y1, x2, y2 = obj['bbox']
                annotations.append(dict(
                    id=ann_id, image_id=img_id, category_id=1,
                    bbox=[x1, y1, x2 - x1, y2 - y1],
                    area=(x2 - x1) * (y2 - y1), iscrowd=0,
                    instance_id=obj['id'] + v * 100,
                    location=[0.0, 0.0, obj['depth']],
                    mot_conf=1.0, visibility=1.0))
                ann_id += 1
            img_id += 1
    ann = dict(images=images, annotations=annotations, videos=videos,
               categories=[dict(id=1, name='drone')])
    ann_path = os.path.join(root, 'annotations.json')
    with open(ann_path, 'w') as f:
        json.dump(ann, f)
    return ann_path
