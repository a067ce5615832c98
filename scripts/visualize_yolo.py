#!/usr/bin/env python
"""Visualize YOLO detections on random test images.

Port of the reference's scripts/visualization/visualize_yolo.py:21-59 using
the native Flax detector.

Usage:
  python scripts/visualize_yolo.py --data-root .../data \
      --yolo-weights runs/detect/linemod_yolo --out-dir results
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--yolo-weights", required=True)
    ap.add_argument("--num-images", type=int, default=4)
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.data.detection import DetectionLoader
    from pose6d_tpu.models.yolo import YoloConfig, YoloV8, batched_nms, decode_outputs
    from pose6d_tpu.models.yolo.train import load_yolo_variables

    loader = DetectionLoader(args.data_root, "test", img_size=640)
    if len(loader) == 0:
        sys.exit("no test images")
    ycfg = YoloConfig(num_classes=loader.num_classes)
    model = YoloV8(ycfg)
    variables = load_yolo_variables(args.yolo_weights, ycfg)
    if variables is None:
        sys.exit(f"no detector checkpoint in {args.yolo_weights}")

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    idxs = rng.choice(len(loader), min(args.num_images, len(loader)), replace=False)

    @jax.jit
    def infer(images):
        from pose6d_tpu.ops.augment import to_float01

        outputs = model.apply(variables, to_float01(images))
        boxes, scores = decode_outputs(outputs, ycfg, (640, 640))
        return batched_nms(boxes, scores, max_det=10, pre_topk=100)

    for i, idx in enumerate(idxs):
        s = loader.load_sample(int(idx))
        dets = infer(jnp.asarray(s["image"])[None])
        canvas = s["image"][:, :, ::-1].copy()  # loader emits uint8 RGB
        for b, c, sc, v in zip(
            np.asarray(dets["boxes"])[0], np.asarray(dets["classes"])[0],
            np.asarray(dets["scores"])[0], np.asarray(dets["valid"])[0],
        ):
            if not v:
                continue
            x1, y1, x2, y2 = b.astype(int)
            cv2.rectangle(canvas, (x1, y1), (x2, y2), (0, 255, 0), 2)
            label = loader.class_names[int(c)] if 0 <= int(c) < len(loader.class_names) else "?"
            cv2.putText(canvas, f"{label} {sc:.2f}", (x1, max(y1 - 5, 12)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
        out_path = os.path.join(args.out_dir, f"yolo_det_{i}.png")
        cv2.imwrite(out_path, canvas)
        print(f"saved {out_path}")


if __name__ == "__main__":
    main()
