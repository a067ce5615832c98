#!/usr/bin/env python
"""Package trained weights into one distributable zip.

Equivalent of the reference's scripts/setup/package_weights.py:25-76: the
four pose-weight dirs plus the detector checkpoint into a single archive
(orbax checkpoint directories instead of .pth files).

Usage:
  python scripts/package_weights.py --out pretrained_weights.zip
"""

import argparse
import os
import sys
import zipfile

WEIGHT_DIRS = [
    "weights_rgb",
    "weights_rgb_geometric",
    "weights_rgbd",
    "weights_rgbd_geometric",
    os.path.join("runs", "detect", "linemod_yolo"),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default=".")
    ap.add_argument("--out", default="pretrained_weights.zip")
    args = ap.parse_args()

    found = [d for d in WEIGHT_DIRS if os.path.isdir(os.path.join(args.root, d))]
    if not found:
        sys.exit("no weight directories found")

    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
        for d in found:
            base = os.path.join(args.root, d)
            for dirpath, _, files in os.walk(base):
                for fn in files:
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, args.root))
            print(f"packaged {d}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
