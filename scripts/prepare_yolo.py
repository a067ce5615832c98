#!/usr/bin/env python
"""Convert LineMOD ground truth into the YOLO dataset layout.

Port of the reference's scripts/setup/prepare_yolo.py:37-135 (same split,
same one-annotation-per-image rule, same class mapping by sorted folder
index, same dataset.yaml).

Usage:
  python scripts/prepare_yolo.py --source datasets/Linemod_preprocessed/data \
      --dest datasets/yolo_ready
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True)
    ap.add_argument("--dest", required=True)
    args = ap.parse_args()

    from pose6d_tpu.data.detection import prepare_yolo_dataset

    stats = prepare_yolo_dataset(args.source, args.dest)
    print("Dataset preparation complete!")
    for split, n in stats.items():
        print(f"  {split}: {n}")


if __name__ == "__main__":
    main()
