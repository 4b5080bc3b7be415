#!/usr/bin/env python3
"""Thread-scaling benchmark for the native C++ batch loader
(native/host_loader.cpp) vs the PIL fallback.

Renders a synthetic URSO-sized PNG/JPEG set, then times decode+resize+pad
batch loads across a thread sweep. Prints one JSON line per
(format, nthreads) plus the PIL single-image baseline.

Usage: python tools/bench_native_loader.py [--n 64] [--threads 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=64, help='images per batch')
    ap.add_argument('--threads', default='1,2,4,8')
    ap.add_argument('--width', type=int, default=1280)
    ap.add_argument('--height', type=int, default=960)
    ap.add_argument('--out', type=int, nargs=2, default=(192, 256),
                    metavar=('H', 'W'))
    args = ap.parse_args()

    from PIL import Image

    from ursonet_tpu.data import native_loader
    if not native_loader.available():
        raise SystemExit('native loader unavailable (g++/libjpeg/libpng)')

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix='nl_bench_')
    paths = {'png': [], 'jpg': []}
    for i in range(args.n):
        img = (rng.rand(args.height, args.width, 3) * 255).astype(np.uint8)
        for fmt in paths:
            p = os.path.join(tmp, f'{i}.{fmt}')
            Image.fromarray(img).save(p)
            paths[fmt].append(p)

    oh, ow = args.out
    results = []
    for fmt in ('png', 'jpg'):
        # PIL baseline: sequential decode + resize
        t0 = time.perf_counter()
        for p in paths[fmt][:16]:
            im = Image.open(p).convert('RGB').resize((ow, oh))
            np.asarray(im)
        pil_rate = 16 / (time.perf_counter() - t0)
        results.append({'loader': 'pil', 'format': fmt, 'threads': 1,
                        'imgs_per_sec': round(pil_rate, 2)})

        for nt in (int(x) for x in args.threads.split(',')):
            native_loader.load_batch(paths[fmt][:4], oh, ow, oh, ow, 0, 0,
                                     nthreads=nt)  # warm page cache
            t0 = time.perf_counter()
            native_loader.load_batch(paths[fmt], oh, ow, oh, ow, 0, 0,
                                     nthreads=nt)
            rate = args.n / (time.perf_counter() - t0)
            results.append({'loader': 'native', 'format': fmt,
                            'threads': nt,
                            'imgs_per_sec': round(rate, 2)})

    for r in results:
        print(json.dumps({**r, 'cores': os.cpu_count()}))


if __name__ == '__main__':
    main()
