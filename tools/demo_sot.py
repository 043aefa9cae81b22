"""Single-object-tracking demo: track an initial box through a frame
directory with SiamRPN++/Stark/PrDiMP.

The SOT analog of tools/demo_track.py::

    python tools/demo_sot.py /path/to/frames --init-bbox 100 80 180 160 \
        --tracker siamrpn --checkpoint siamrpn.ckpt \
        --out-txt work_dirs/track.txt [--show-dir work_dirs/vis]
"""
import argparse
import glob
import os
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description='SOT demo')
    p.add_argument('frames', help='directory of ordered frame images')
    p.add_argument('--init-bbox', type=float, nargs=4, required=True,
                   metavar=('X1', 'Y1', 'X2', 'Y2'))
    p.add_argument('--tracker', default='siamrpn',
                   choices=['siamrpn', 'stark', 'prdimp'])
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--out-txt', default=None,
                   help='write x,y,w,h per frame (GOT10k submission row)')
    p.add_argument('--show-dir', default=None,
                   help='render the tracked box every frame')
    p.add_argument('--cfg-options', nargs='*', default=[],
                   metavar='KEY=VALUE',
                   help='tracker test-config overrides, e.g. '
                        'exemplar_size=63 search_size=127')
    return p.parse_args()


def main():
    args = parse_args()
    import numpy as np
    import PIL.Image

    from stereotracking_tpu.apis.inference import (inference_sot,
                                                   init_sot_model)

    variables = None
    if args.checkpoint:
        from flax import serialization

        from stereotracking_tpu.models.sot import SiamRPNModule
        with open(args.checkpoint, 'rb') as f:
            raw = f.read()
        # structural restore against a freshly initialized tree
        model0 = init_sot_model(args.tracker)  # canonical sizes
        variables = serialization.from_bytes(model0.variables, raw)
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        overrides[k] = float(v) if '.' in v else int(v)
    model = init_sot_model(args.tracker, variables=variables, **overrides)

    frames = sorted(glob.glob(os.path.join(args.frames, '*.jpg'))
                    + glob.glob(os.path.join(args.frames, '*.png')))
    assert frames, f'no frames under {args.frames}'

    rows = []
    state = None
    for i, path in enumerate(frames):
        img = np.asarray(PIL.Image.open(path).convert('RGB'), np.float32)
        if i == 0:
            state, out = inference_sot(model, img,
                                       init_bbox=args.init_bbox)
        else:
            state, out = inference_sot(model, img, state=state)
        b = out['bboxes'][0]
        rows.append((b[0], b[1], b[2] - b[0], b[3] - b[1]))
        print(f'frame {i}: bbox=({b[0]:.1f},{b[1]:.1f},{b[2]:.1f},'
              f'{b[3]:.1f}) score={out["scores"][0]:.3f}', flush=True)
        if args.show_dir:
            os.makedirs(args.show_dir, exist_ok=True)
            vis = np.asarray(PIL.Image.open(path).convert('RGB')).copy()
            x1, y1, x2, y2 = [int(round(float(v))) for v in b]
            h, w = vis.shape[:2]
            x1, x2 = max(x1, 0), min(x2, w - 1)
            y1, y2 = max(y1, 0), min(y2, h - 1)
            vis[y1:y2 + 1, [x1, x2]] = [255, 40, 40]
            vis[[y1, y2], x1:x2 + 1] = [255, 40, 40]
            PIL.Image.fromarray(vis).save(
                os.path.join(args.show_dir, os.path.basename(path)))

    if args.out_txt:
        os.makedirs(os.path.dirname(args.out_txt) or '.', exist_ok=True)
        with open(args.out_txt, 'w') as f:
            for r in rows:
                f.write(f'{r[0]:.4f},{r[1]:.4f},{r[2]:.4f},{r[3]:.4f}\n')
        print(f'wrote {len(rows)} rows to {args.out_txt}')


if __name__ == '__main__':
    main()
