"""Drive tools/test.py at speed on the chip (VERDICT r4 #7).

Generates a synthetic multi-video AirDrone-style validation set on disk
(tests/synthetic_dataset.py generator — real PNG decode in the loop), then
runs the REAL ``tools/test.py`` flow — VideoSampler ordering, per-frame
metrics streaming, CSV dump, MOT txt — with the multistream batched program
(``--streams``) and HBM frame staging (``--stage-frames``), and reports the
eval-loop pairs/s alongside the metrics.

This proves the framework surface (sampler, metrics, CSV) sustains the
target rate, not just bench.py's inner loop.  Run on the TPU host:

    python tools/bench_eval_loop.py [--videos 8] [--frames 30]
        [--height 720] [--width 1280] [--streams 8]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--videos', type=int, default=8)
    p.add_argument('--frames', type=int, default=30)
    p.add_argument('--height', type=int, default=720)
    p.add_argument('--width', type=int, default=1280)
    p.add_argument('--streams', type=int, default=8)
    p.add_argument('--no-stage', action='store_true',
                   help='do not pre-stage frames in HBM (includes the dev '
                        'tunnel H2D in the wall clock)')
    p.add_argument('--out', default='work_dirs/bench_eval_loop')
    args = p.parse_args()

    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from synthetic_dataset import write_airdrone_dataset

    with tempfile.TemporaryDirectory() as root:
        print(f'[bench_eval_loop] writing {args.videos}x{args.frames} '
              f'frames at {args.width}x{args.height} ...', flush=True)
        write_airdrone_dataset(root, n_videos=args.videos,
                               n_frames=args.frames, h=args.height,
                               w=args.width)
        cfg = os.path.join(root, 'cfg.py')
        with open(cfg, 'w') as f:
            f.write(f"""
_base_ = ['{REPO}/configs/stereo_tracking/ocsort/yolox_s_airdrone_disp.py']
data_root = '{root}/'
img_scale = ({args.height}, {args.width})
val_dataloader = dict(dataset=dict(data_root='{root}/',
                                   ann_file='annotations.json',
                                   img_prefix='',
                                   depth_dir_name='depth'))
test_dataloader = val_dataloader
""")
        cmd = [sys.executable, os.path.join(REPO, 'tools', 'test.py'), cfg,
               '--work-dir', args.out, '--dump-txt', '--bf16',
               '--results-csv', os.path.join(args.out, 'results.csv'),
               '--streams', str(args.streams)]
        if not args.no_stage:
            cmd.append('--stage-frames')
        env = dict(os.environ)
        env['PYTHONPATH'] = f"{REPO}:{env.get('PYTHONPATH', '')}"
        r = subprocess.run(cmd, env=env, text=True)
        if r.returncode != 0:
            sys.exit(r.returncode)
    with open(os.path.join(args.out, 'metrics.json')) as f:
        metrics = json.load(f)
    print(json.dumps({'eval_loop_pairs_per_sec': round(metrics['fps'], 2),
                      'streams': args.streams,
                      'staged': not args.no_stage,
                      'videos': args.videos, 'frames': args.frames,
                      'MOTA': metrics.get('MOTA'),
                      'IDF1': metrics.get('IDF1'),
                      'HOTA': metrics.get('HOTA')}))


if __name__ == '__main__':
    main()
