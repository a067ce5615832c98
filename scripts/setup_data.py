#!/usr/bin/env python
"""Fetch or synthesize the dataset.

The reference downloads Linemod_preprocessed.zip from Google Drive via
gdown (scripts/setup/setup_data.py:24-64). Network access is environment-
dependent; this script attempts the same download when possible and offers
`--synthetic` to generate the hermetic synthetic LineMOD tree instead (the
test/bench fixture).

Usage:
  python scripts/setup_data.py --dest datasets                # download
  python scripts/setup_data.py --dest datasets --synthetic    # offline
"""

import argparse
import os
import sys
import zipfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

GDRIVE_FILE_ID = "1YFUra533pxS_IHsb9tB87lLoxbcHYXt8"  # Linemod_preprocessed.zip


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dest", default="datasets")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--objects", type=int, default=2)
    ap.add_argument("--frames", type=int, default=50)
    args = ap.parse_args()

    os.makedirs(args.dest, exist_ok=True)

    if args.synthetic:
        from pose6d_tpu.data.synthetic import generate_synthetic_linemod

        root = os.path.join(args.dest, "Linemod_synthetic")
        paths = generate_synthetic_linemod(
            root, obj_ids=tuple(range(1, args.objects + 1)), frames_per_obj=args.frames
        )
        print(f"synthetic dataset ready: {paths}")
        return

    target = os.path.join(args.dest, "Linemod_preprocessed")
    if os.path.exists(target):
        print(f"{target} already exists")
        return

    zip_path = os.path.join(args.dest, "Linemod_preprocessed.zip")
    try:
        import gdown  # optional; not in the hermetic environment
    except ImportError:
        sys.exit(
            "gdown is unavailable in this environment. Either install it, place "
            f"Linemod_preprocessed.zip at {zip_path} manually, or use --synthetic."
        )

    gdown.download(id=GDRIVE_FILE_ID, output=zip_path, quiet=False)
    print("Extracting...")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(args.dest)
    print(f"done: {target}")


if __name__ == "__main__":
    main()
