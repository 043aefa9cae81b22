#!/usr/bin/env python
"""Extract detector-only weights from a train-state checkpoint
(reference tools/utils/extract_det_model.py:14-44)."""
import argparse
import os
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint')
    p.add_argument('output')
    p.add_argument('--no-ema', action='store_true',
                   help='export raw params instead of EMA weights')
    args = p.parse_args()

    from stereotracking_tpu.train.checkpoint import (load_checkpoint,
                                                     save_checkpoint)
    state = load_checkpoint(args.checkpoint)
    if isinstance(state, dict) and 'ema_params' in state and not args.no_ema:
        out = {'params': state['ema_params'],
               'batch_stats': state.get('ema_batch_stats', {})}
    elif isinstance(state, dict) and 'params' in state:
        out = {'params': state['params'],
               'batch_stats': state.get('batch_stats', {})}
    else:
        out = state
    save_checkpoint(args.output, out)
    print(f'wrote detector weights to {args.output}')


if __name__ == '__main__':
    main()
