#!/usr/bin/env python
"""Stamp a checkpoint with its content hash for publishing
(reference tools/misc/publish_model.py)."""
import argparse
import hashlib
import shutil


def main():
    p = argparse.ArgumentParser()
    p.add_argument('in_file')
    p.add_argument('out_file')
    args = p.parse_args()
    with open(args.in_file, 'rb') as f:
        sha = hashlib.sha256(f.read()).hexdigest()[:8]
    out = args.out_file
    if out.endswith('.ckpt'):
        out = out[:-5] + f'-{sha}.ckpt'
    else:
        out = out + f'-{sha}'
    shutil.copyfile(args.in_file, out)
    print(f'published: {out}')


if __name__ == '__main__':
    main()
