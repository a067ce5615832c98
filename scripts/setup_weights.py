#!/usr/bin/env python
"""Unpack a pretrained-weights archive into the expected layout.

Equivalent of the reference's scripts/setup/setup_weights.py:25-130
(download + unzip + structure repair). Download is environment-dependent
(zero-egress boxes must provide the zip locally); the structure check
verifies each expected orbax checkpoint directory exists.

Usage:
  python scripts/setup_weights.py --zip pretrained_weights.zip --dest .
"""

import argparse
import os
import sys
import zipfile

EXPECTED = [
    ("weights_rgb", "best"),
    ("weights_rgb_geometric", "best"),
    ("weights_rgbd", "best"),
    ("weights_rgbd_geometric", "best"),
    (os.path.join("runs", "detect", "linemod_yolo"), "best"),
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--zip", dest="zip_path", default="pretrained_weights.zip")
    ap.add_argument("--dest", default=".")
    ap.add_argument("--gdrive-id", default=None,
                    help="optional Google Drive file id to fetch via gdown")
    args = ap.parse_args()

    if not os.path.exists(args.zip_path) and args.gdrive_id:
        try:
            import gdown
        except ImportError:
            sys.exit("gdown unavailable; provide the zip locally")
        gdown.download(id=args.gdrive_id, output=args.zip_path, quiet=False)

    if not os.path.exists(args.zip_path):
        sys.exit(f"{args.zip_path} not found")

    with zipfile.ZipFile(args.zip_path) as zf:
        zf.extractall(args.dest)
    print(f"extracted {args.zip_path} -> {args.dest}")

    missing = [
        os.path.join(d, n)
        for d, n in EXPECTED
        if not os.path.isdir(os.path.join(args.dest, d, n))
        and not os.path.isdir(os.path.join(args.dest, d, "last"))
    ]
    for m in missing:
        print(f"warning: expected checkpoint missing: {m}")
    if not missing:
        print("all expected checkpoints present")


if __name__ == "__main__":
    main()
