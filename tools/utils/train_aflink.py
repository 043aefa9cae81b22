#!/usr/bin/env python
"""Train the AFLink tracklet linker on synthetic motion windows and save a
checkpoint usable with ``tools/test.py --aflink <ckpt>``.

The reference distributes a pretrained AFLink checkpoint
(mmtrack/models/task_modules/track/aflink.py:150-168 loads it); AFLink is
appearance-free so the equivalent is trained here from synthetic
trajectories.
"""
import argparse
import os
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='work_dirs/aflink/aflink.ckpt')
    p.add_argument('--steps', type=int, default=300)
    p.add_argument('--batch', type=int, default=128)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()

    if os.environ.get('JAX_PLATFORMS'):
        import jax
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

    from stereotracking_tpu.train.checkpoint import save_checkpoint
    from stereotracking_tpu.train.train_aflink import train_aflink

    variables, acc = train_aflink(seed=args.seed, steps=args.steps,
                                  batch=args.batch, lr=args.lr)
    save_checkpoint(args.out, variables)
    print(f'held-out accuracy {acc:.3f}; saved to {args.out}')


if __name__ == '__main__':
    main()
