#!/usr/bin/env python
"""Print the fully merged config (reference tools/misc/print_config.py)."""
import argparse
import os
import pprint
import sys

if __name__ == '__main__' and not __package__:
    # repo-script fallback; a `pip install -e .` makes this a no-op
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='*', default=None)
    args = p.parse_args()
    from stereotracking_tpu.config import apply_overrides, load_config
    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    pprint.pprint(cfg, width=100, sort_dicts=False)


if __name__ == '__main__':
    main()
