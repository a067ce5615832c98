"""Benchmark harness: end-to-end frames/sec on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
Baseline target (BASELINE.md): >= 5000 frames/sec/chip END-TO-END
detect -> crop -> pose (full unified pipeline: YOLOv8n forward, NMS,
best-box, device crop+resize, normalize, PoseNet forward, pinhole
correction; bf16 compute; random-init weights — throughput is
weight-independent).

Measurement method: host-side timing is unreliable on tunneled/remote
backends (dispatch is fire-and-forget, completion signals are lazy, and a
host fetch pays seconds of RTT). Instead, N pipeline iterations are CHAINED
inside one jit through a data dependency (each iteration's output perturbs
the next iteration's input), and the per-iteration device time is the
difference quotient between an N=1+K and an N=1 run — RTT, dispatch, and
fetch costs cancel.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 5000.0


def _build_pipeline(batch_size, variant="rgb", max_objects=1):
    import jax.numpy as jnp

    from pose6d_tpu.infer import PipelineConfig, PosePipeline
    from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
    from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8
    import jax

    ycfg = YoloConfig(num_classes=13, dtype=jnp.bfloat16)
    yolo = YoloV8(ycfg)
    yvars = yolo.init(jax.random.key(0), jnp.zeros((1, 640, 640, 3)))
    # POSE6D_BENCH_S2D=1: space-to-depth ResNet stems (exact reparam of the
    # 7x7/s2 conv1, models/resnet.py) — perf A/B knob for the bench only
    pcfg = PoseNetConfig(variant=variant, img_size=224, dtype=jnp.bfloat16,
                         stem_s2d=bool(int(os.environ.get("POSE6D_BENCH_S2D", "0"))))
    pose = PoseNet(pcfg)
    pose_kwargs = {}
    if variant == "rgbd":
        pose_kwargs["depth"] = jnp.zeros((1, 224, 224, 1))
    pvars = pose.init(jax.random.key(1), jnp.zeros((1, 224, 224, 3)), **pose_kwargs)
    # nms_pre_topk=32 measured +0.8% for rgbd (PERF.md sweep table); still a
    # 4x margin over max_det=8 on LineMOD's one-object-per-frame fields
    pipe = PosePipeline(
        PipelineConfig(variant=variant, det_size=640, conf_thresh=0.0,
                       compute_dtype=jnp.bfloat16, max_objects=max_objects,
                       nms_pre_topk=32 if variant == "rgbd" else 64),
        ycfg, yvars, pvars, pcfg,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 255, size=(batch_size, 480, 640, 3), dtype=np.uint8)
    )
    K = jnp.asarray(
        np.tile(
            np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32),
            (batch_size, 1, 1),
        )
    )
    return pipe, frames, K


def _timed_chain(pipe, frames, K, n_iters):
    """Wall time of ONE jit call running n_iters chained pipeline iterations,
    ending in a tiny host fetch (forces true completion)."""
    import jax
    import jax.numpy as jnp

    depth = jnp.zeros(frames.shape[:3], jnp.float32)

    @jax.jit
    def run_n(yv, pv, fr, K, depth, q, fd):
        def body(i, carry):
            # data dependency: perturb the input with the previous output
            fr_i = fr + carry
            out = pipe._run_impl(yv, pv, fr_i, K, depth, q, fd)
            return (jnp.sum(out["translation"]) > -1e9).astype(jnp.uint8)

        c = jax.lax.fori_loop(0, n_iters, body, jnp.uint8(0))
        return c

    # warm-up MUST be fetched: on lazy remote backends compile+execute only
    # happen when a result is actually materialized (block_until_ready is
    # not sufficient). The quantized/folded trees (serving modes) ride as
    # jit ARGUMENTS like the model variables — closed-over they would embed
    # as literals.
    args = (pipe.yolo_variables, pipe.pose_variables, frames, K, depth,
            pipe._quantized, pipe._folded)
    _ = np.asarray(run_n(*args))
    t0 = time.perf_counter()
    c = run_n(*args)
    _ = np.asarray(c)  # tiny fetch forces completion of the whole chain
    return time.perf_counter() - t0


def _sum_of_parts(pipe, frames, K, iters=20):
    """Fallback: time each pipeline stage standalone (distinct inputs per
    call) and sum. Physically meaningful even when composed-graph timing is
    unavailable; slightly optimistic about overlap, slightly pessimistic
    about fusion."""
    import jax
    import jax.numpy as jnp

    from pose6d_tpu.models.yolo.decode import batched_nms, decode_outputs
    from pose6d_tpu.ops.crop_resize import crop_resize_matmul

    B, H, W, _ = frames.shape
    frames2 = frames[:, ::-1]

    def fetch(out):
        # lazy remote backends only execute what gets materialized
        return np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    triv = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros((8, 128))
    fetch(triv(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(triv(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]

    def timed(f, variants):
        fetch(f(*variants[0]))  # warm: compile + first execute
        reps = []
        for _ in range(3):  # median-of-3 guards against RTT spikes
            t0 = time.perf_counter()
            for i in range(iters):
                fetch(f(*variants[i % len(variants)]))
            reps.append((time.perf_counter() - t0) / iters)
        return max(sorted(reps)[1] - rtt, 0.0)

    conv = jax.jit(lambda fr: fr.astype(jnp.bfloat16) / 255.0)
    t_conv = timed(conv, [(frames,), (frames2,)])
    imgs = conv(frames)
    imgs2 = conv(frames2)

    yolo_fwd = jax.jit(lambda v, x: pipe.yolo.apply(v, x))
    t_yolo = timed(yolo_fwd, [(pipe.yolo_variables, imgs), (pipe.yolo_variables, imgs2)])
    outs = yolo_fwd(pipe.yolo_variables, imgs)

    dec = jax.jit(lambda o: decode_outputs(o, pipe.yolo_cfg, (H, W)))
    t_dec = timed(dec, [(outs,)])
    boxes, scores = dec(outs)

    nms = jax.jit(lambda b, s: batched_nms(b, s, max_det=8, pre_topk=64, conf_thresh=0.0))
    t_nms = timed(nms, [(boxes, scores)])

    x1 = jnp.full((B,), 100.0)
    y1 = jnp.full((B,), 80.0)
    size = jnp.full((B,), 180.0)
    crop = jax.jit(lambda im: crop_resize_matmul(im, x1, y1, size, 224, jnp.bfloat16))
    t_crop = timed(crop, [(imgs,), (imgs2,)])
    crops = crop(imgs).astype(jnp.bfloat16)
    crops2 = crop(imgs2).astype(jnp.bfloat16)

    pose_fwd = jax.jit(lambda v, x: pipe.posenet.apply(v, x))
    t_pose = timed(pose_fwd, [(pipe.pose_variables, crops), (pipe.pose_variables, crops2)])

    return t_conv + t_yolo + t_dec + t_nms + t_crop + t_pose


def bench_e2e(batch_size=128, chain=200, variant="rgb", int8_backbone=False,
              max_objects=1, folded_backbone=False):
    import sys

    pipe, frames, K = _build_pipeline(batch_size, variant, max_objects)
    if int8_backbone:
        # int8 serving mode: PTQ the ResNet towers AND the detector
        # (ops/quant.py, models/yolo/quant.py). Random weights make the
        # ACCURACY of this mode meaningless here (that gate is
        # scripts/eval_e2e.py --int8-backbone on trained checkpoints);
        # throughput is weight-independent.
        pipe.quantize_backbones(np.asarray(frames), np.asarray(K),
                                include_detector=True)
    elif folded_backbone:
        # folded bf16 serving mode: BN folded into conv weights (exact
        # eval-mode identity, plain XLA convs). Accuracy gate:
        # scripts/eval_e2e.py --folded-backbone on trained checkpoints.
        # The Pallas fused kernels stay OPT-IN (POSE6D_BENCH_FOLDED_PALLAS /
        # _STEM / _STAGES): the on-chip probe (probe_pallas_block.py) has to
        # clear Mosaic numerics+lowering first — round 4 found three real
        # constraints there (sub-32-bit dynamic_rotate, 16 MiB scoped-VMEM
        # default, layout-unsupported shape casts in im2col reshapes;
        # parity/logs/probe_pallas_block*.log).
        stages = tuple(int(s) for s in os.environ.get(
            "POSE6D_BENCH_FOLDED_STAGES", "").split(",") if s)
        pipe.fold_backbones(
            pallas_layer1=bool(int(os.environ.get(
                "POSE6D_BENCH_FOLDED_PALLAS", "0"))) and 1 not in stages,
            pallas_stem=bool(int(os.environ.get("POSE6D_BENCH_FOLDED_STEM",
                                                "0"))),
            pallas_stages=stages)
    t1 = _timed_chain(pipe, frames, K, 1)
    tn = _timed_chain(pipe, frames, K, 1 + chain)
    dt = tn - t1
    print(f"[bench] {variant}: t(N=1)={t1:.3f}s t(N={1 + chain})={tn:.3f}s",
          file=sys.stderr)
    # sanity: `chain` full-pipeline iterations cannot take < 50 ms of device
    # time at any batch size; if the difference is smaller, the runtime is
    # not timing honestly (observed on tunneled backends) -> fall back to
    # per-stage sums
    if dt > 0.05:
        return batch_size * chain / dt, "chained_difference"
    per_iter = _sum_of_parts(pipe, frames, K)
    print(f"[bench] chained timing unusable (dt={dt:.4f}s); per-stage sum "
          f"{per_iter * 1e3:.2f} ms/batch", file=sys.stderr)
    return batch_size / per_iter, "sum_of_parts"


def main():
    # headline: the rgb variant (the reference's fastest deployed path)
    fps, method = bench_e2e()
    # flagship: rgbd (dual-ResNet50 + cross-modal fusion — __graft_entry__'s
    # entry() model); shorter chain, the model is ~2x the compute
    rgbd_fps, rgbd_method = bench_e2e(chain=100, variant="rgbd")
    # int8 serving mode (towers + detector PTQ on the int8 MXU path) —
    # reported as a separate labeled field, never the headline; the
    # accuracy gate for this mode is in PARITY_RESULTS.md (eval_e2e
    # --int8-backbone: accuracy-neutral on the trained fixture system).
    # POSE6D_BENCH_INT8=0 skips it.
    extra = {}

    def optional_row(tag, fn):
        # an opt-in serving-mode row must never take down the round's bench
        # artifact (e.g. a Mosaic-only Pallas failure in the folded mode):
        # record the error as a labeled field and keep the headline rows
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — report, don't die
            import traceback

            traceback.print_exc(file=sys.stderr)
            extra[f"{tag}_error"] = f"{type(e).__name__}: {e}"[:200]

    def _int8_rows():
        i8_fps, i8_method = bench_e2e(chain=100, variant="rgbd",
                                      int8_backbone=True)
        extra["rgbd_int8_value"] = round(i8_fps, 1)
        extra["rgbd_int8_method"] = i8_method
        rgb_i8_fps, rgb_i8_method = bench_e2e(chain=100, variant="rgb",
                                              int8_backbone=True)
        extra["rgb_int8_value"] = round(rgb_i8_fps, 1)
        extra["rgb_int8_method"] = rgb_i8_method

    def _folded_row():
        # folded bf16 serving mode (fold_backbones: BN folded into conv
        # weights + Pallas fused layer1) — the round-4 probe of the
        # stem+layer1 bandwidth ceiling, riding the full pipeline.
        # Accuracy-gated by eval_e2e --folded-backbone.
        f_fps, f_method = bench_e2e(chain=100, variant="rgbd",
                                    folded_backbone=True)
        extra["rgbd_folded_value"] = round(f_fps, 1)
        extra["rgbd_folded_method"] = f_method

    def _multiobj_row():
        # multi-object serving: max_objects=4 (the reference's inference
        # loops over every detected box, reference
        # scripts/inference/inference_rgb.py:70 — here all 4 crops ride one
        # batched pose forward inside the same jit).
        mo_fps, mo_method = bench_e2e(chain=100, variant="rgb", max_objects=4)
        extra["rgb_maxobj4_value"] = round(mo_fps, 1)
        extra["rgb_maxobj4_method"] = mo_method

    def _latency_row():
        # serving latency at batch 1 (the regime of the reference's
        # "real-time" claim, reference README.md:5): chained-difference on
        # the bf16 flagship. Full table: scripts/bench_latency.py.
        b1_fps, b1_method = bench_e2e(batch_size=1, chain=400, variant="rgbd")
        extra["latency_ms_b1"] = round(1e3 / b1_fps, 3)
        extra["latency_ms_b1_method"] = b1_method

    # each row is skippable via POSE6D_BENCH_<NAME>=0
    for name, fn in (("INT8", _int8_rows), ("FOLDED", _folded_row),
                     ("MULTIOBJ", _multiobj_row), ("LATENCY", _latency_row)):
        if int(os.environ.get(f"POSE6D_BENCH_{name}", "1")):
            optional_row(name.lower(), fn)
    print(
        json.dumps(
            {
                "metric": "e2e_detect_crop_pose_frames_per_sec",
                "value": round(fps, 1),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                **extra,
                "method": method,
                "rgbd_value": round(rgbd_fps, 1),
                "rgbd_method": rgbd_method,
                # which field answers BASELINE.json's 5,000 fps/chip target:
                # the bf16 flagship (rgbd_value); *_int8_value rows are the
                # quantized serving mode, accuracy-gated separately in
                # PARITY_RESULTS.md (eval_e2e --int8-backbone)
                "target_fps": BASELINE_FPS,
                "target_answered_by": "rgbd_value (bf16 flagship)",
            }
        )
    )


if __name__ == "__main__":
    main()
