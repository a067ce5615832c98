"""Unified detect->crop->pose pipeline: jit-ability + variant semantics.

Runs with randomly initialized models (correctness of weights is covered by
train tests); here we verify the graph wiring: shapes, geometric-correction
invariants, depth plumbing, and that the whole thing compiles as one jit.
Uses a small det size to keep CPU runtime down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.infer import PipelineConfig, PosePipeline
from pose6d_tpu.models.posenet import PoseNet, PoseNetConfig
from pose6d_tpu.models.yolo.model import YoloConfig, YoloV8

DET = 160
IMG = 64


def _make_pipeline(variant):
    ycfg = YoloConfig(num_classes=2)
    yolo = YoloV8(ycfg)
    yvars = yolo.init(jax.random.key(0), jnp.zeros((1, DET, DET, 3)))
    pcfg = PoseNetConfig(variant=variant, img_size=IMG, dtype=jnp.float32)
    pose = PoseNet(pcfg)
    kwargs = {}
    if variant == "rgbd":
        kwargs["depth"] = jnp.zeros((1, IMG, IMG, 1))
    if variant in ("rgb_geometric", "rgbd_geometric"):
        kwargs["bbox_center"] = jnp.zeros((1, 2))
        kwargs["camera_matrix"] = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    if variant == "rgbd_geometric":
        kwargs["depth_raw"] = jnp.zeros((1, IMG, IMG))
    pvars = pose.init(jax.random.key(1), jnp.zeros((1, IMG, IMG, 3)), **kwargs)
    cfg = PipelineConfig(variant=variant, img_size=IMG, det_size=DET,
                         conf_thresh=0.0, compute_dtype=jnp.float32)
    return PosePipeline(cfg, ycfg, yvars, pvars, pcfg)


@pytest.fixture(scope="module")
def frames(rng=None):
    r = np.random.default_rng(0)
    return r.integers(0, 255, size=(2, 120, 160, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def K():
    return np.asarray([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]], np.float32)


def test_rgb_pipeline_shapes_and_correction(frames, K):
    pipe = _make_pipeline("rgb")
    out = pipe(frames, K)
    assert out["rotation"].shape == (2, 4)
    assert out["translation"].shape == (2, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["rotation"]), axis=-1), 1.0, atol=1e-4
    )
    # geometric correction: X/Y satisfy the pinhole relation w.r.t. bbox center
    t = np.asarray(out["translation"])
    bb = np.asarray(out["bbox_xywh"])
    cx = bb[:, 0] + bb[:, 2] / 2
    cy = bb[:, 1] + bb[:, 3] / 2
    np.testing.assert_allclose(t[:, 0], (cx - 80.0) * t[:, 2] / 150.0, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(t[:, 1], (cy - 60.0) * t[:, 2] / 150.0, rtol=1e-3, atol=1e-5)


def test_rgb_no_correction(frames, K):
    pipe = _make_pipeline("rgb")
    # build a separate pipeline with correction off
    cfg = PipelineConfig(variant="rgb", img_size=IMG, det_size=DET, conf_thresh=0.0,
                         geometric_correction=False, compute_dtype=jnp.float32)
    pipe2 = PosePipeline(cfg, pipe.yolo_cfg, pipe.yolo_variables, pipe.pose_variables,
                         pipe.pose_cfg)
    out = pipe2(frames, K)
    # uncorrected translation comes straight from the head: z-bias init 0.5
    assert out["translation"].shape == (2, 3)


def test_rgbd_geometric_uses_depth(frames, K):
    pipe = _make_pipeline("rgbd_geometric")
    depth = np.full((2, 120, 160), 0.9, np.float32)
    out = pipe(frames, K, depth)
    t = np.asarray(out["translation"])
    # Z sampled from a constant 0.9 m depth map — unless the (random-weight)
    # detector put the bbox center outside the frame, where the zero-padded
    # crop triggers the 0.5 m invalid-depth fallback. Both are correct
    # plumbing; anything else is a wiring bug.
    for z in t[:, 2]:
        assert abs(z - 0.9) < 1e-3 or abs(z - 0.5) < 1e-3, z


def test_rgbd_variant_runs(frames, K):
    pipe = _make_pipeline("rgbd")
    depth = np.full((2, 120, 160), 0.8, np.float32)
    out = pipe(frames, K, depth)
    assert out["rotation"].shape == (2, 4)
    assert np.isfinite(np.asarray(out["translation"])).all()


def test_detections_exposed(frames, K):
    pipe = _make_pipeline("rgb")
    out = pipe(frames, K)
    dets = out["detections"]
    assert dets["boxes"].shape[0] == 2
    assert dets["valid"].dtype == bool


def test_native_resolution_detection_path(K):
    # frames divisible by the coarsest stride (32) -> no letterbox branch
    pipe = _make_pipeline("rgb")
    r = np.random.default_rng(1)
    frames32 = r.integers(0, 255, size=(2, 96, 128, 3), dtype=np.uint8)
    out = pipe(frames32, K)
    assert out["rotation"].shape == (2, 4)
    bb = np.asarray(out["bbox_xywh"])
    assert np.isfinite(bb).all()


def test_multi_object_mode(frames, K):
    # max_objects > 1: the reference's per-box loop, vectorized
    base = _make_pipeline("rgb")
    cfg = PipelineConfig(variant="rgb", img_size=IMG, det_size=DET, conf_thresh=0.0,
                         max_objects=3, compute_dtype=jnp.float32)
    pipe = PosePipeline(cfg, base.yolo_cfg, base.yolo_variables, base.pose_variables,
                        base.pose_cfg)
    out = pipe(frames, K)
    assert out["rotation"].shape == (2, 3, 4)
    assert out["translation"].shape == (2, 3, 3)
    assert out["bbox_xywh"].shape == (2, 3, 4)
    assert out["det_valid"].shape == (2, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["rotation"]), axis=-1), 1.0, atol=1e-4
    )


def test_sharded_pipeline_matches_single_device(frames, K):
    # batch sharded over 'data' on the virtual 8-CPU mesh, pose head MLPs
    # Megatron-sharded over 'model' — outputs must match the unsharded run
    from pose6d_tpu.parallel import make_mesh

    pipe = _make_pipeline("rgb")
    r = np.random.default_rng(2)
    frames8 = r.integers(0, 255, size=(8, 96, 128, 3), dtype=np.uint8)
    ref = {k: np.asarray(v) for k, v in pipe(frames8, K).items() if k != "detections"}

    mesh = make_mesh((4, 2))
    sharded = _make_pipeline("rgb")
    # same weights as the reference pipeline
    sharded.yolo_variables = pipe.yolo_variables
    sharded.pose_variables = pipe.pose_variables
    sharded = sharded.shard(mesh)
    out = sharded(frames8, K)
    assert len(out["rotation"].sharding.device_set) == 8
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), ref[k], rtol=1e-3, atol=1e-4, err_msg=k
        )


def test_int8_backbone_pipeline(frames, K):
    """quantize_backbones flips the pose towers to the int8 serving path;
    the pipeline still runs end-to-end and its outputs stay close to the
    float pipeline's (same detector, same crops, PTQ towers)."""
    pipe = _make_pipeline("rgbd")
    depth = np.random.default_rng(3).uniform(
        0.2, 1.5, size=frames.shape[:3]).astype(np.float32)
    out_f = pipe(frames, K, depth)
    pipe.quantize_backbones(frames, K, depth)
    assert set(pipe._quantized) == {"rgb_backbone", "depth_backbone"}
    out_q = pipe(frames, K, depth)
    # identical detector path -> identical boxes
    np.testing.assert_allclose(np.asarray(out_q["bbox_xywh"]),
                               np.asarray(out_f["bbox_xywh"]), atol=1e-5)
    rot_f = np.asarray(out_f["rotation"])
    rot_q = np.asarray(out_q["rotation"])
    assert np.all(np.abs(np.sum(rot_f * rot_q, axis=-1)) > 0.9)
    assert np.all(np.isfinite(np.asarray(out_q["translation"])))


def test_int8_backbone_pipeline_rgb(frames, K):
    """The single-tower rgb variant supports the same int8 serving flip
    (bench.py reports it as rgb_int8_value); detector PTQ included so the
    bench configuration is what gets tested."""
    pipe = _make_pipeline("rgb")
    out_f = pipe(frames, K)
    pipe.quantize_backbones(frames, K, include_detector=True)
    assert set(pipe._quantized) == {"backbone", "__yolo__"}
    out_q = pipe(frames, K)
    rot_f = np.asarray(out_f["rotation"])
    rot_q = np.asarray(out_q["rotation"])
    assert np.all(np.abs(np.sum(rot_f * rot_q, axis=-1)) > 0.9)
    assert np.all(np.isfinite(np.asarray(out_q["translation"])))
    assert np.all(np.isfinite(np.asarray(out_q["bbox_xywh"])))


def test_sharded_int8_pipeline(frames, K):
    """int8 serving mode composed with mesh sharding: the quantized trees
    ride as (replicated) jit arguments while frames stay batch-sharded —
    outputs must match the same quantized pipeline run unsharded."""
    from pose6d_tpu.parallel import make_mesh

    r = np.random.default_rng(4)
    frames8 = r.integers(0, 255, size=(8, 96, 128, 3), dtype=np.uint8)
    depth8 = r.uniform(0.2, 1.5, size=frames8.shape[:3]).astype(np.float32)

    pipe = _make_pipeline("rgbd")
    pipe.quantize_backbones(frames8, K, depth8)
    ref = {k: np.asarray(v) for k, v in pipe(frames8, K, depth8).items()
           if k != "detections"}

    sharded = _make_pipeline("rgbd")
    sharded.yolo_variables = pipe.yolo_variables
    sharded.pose_variables = pipe.pose_variables
    sharded = sharded.shard(make_mesh((4, 2)))
    sharded._quantized = pipe._quantized  # same calibration, same trees
    out = sharded(frames8, K, depth8)
    assert len(out["rotation"].sharding.device_set) == 8
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), ref[k], rtol=1e-3, atol=1e-4, err_msg=k
        )


def test_int8_detector_pipeline(frames, K):
    """include_detector=True also PTQs the YOLO graph; the pipeline still
    produces finite poses and plausible boxes."""
    pipe = _make_pipeline("rgb")
    out_f = pipe(frames, K)
    pipe.quantize_backbones(frames, K, include_detector=True)
    assert "__yolo__" in pipe._quantized
    out_q = pipe(frames, K)
    assert np.all(np.isfinite(np.asarray(out_q["rotation"])))
    assert np.all(np.isfinite(np.asarray(out_q["bbox_xywh"])))
    # random-weight logits are near-flat, so boxes can move under PTQ noise;
    # shape/finite checks + the trained-weight accuracy gate (eval_e2e
    # --int8-backbone) carry the correctness burden
    assert out_q["rotation"].shape == out_f["rotation"].shape

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow


def test_sharded_folded_pipeline(frames, K):
    """folded-bf16 serving mode composed with mesh sharding: the folded
    trees ride as (replicated) jit arguments like the int8 trees — outputs
    must match the same folded pipeline run unsharded."""
    from pose6d_tpu.parallel import make_mesh

    r = np.random.default_rng(5)
    frames8 = r.integers(0, 255, size=(8, 96, 128, 3), dtype=np.uint8)

    pipe = _make_pipeline("rgb")
    pipe.fold_backbones()
    ref = {k: np.asarray(v) for k, v in pipe(frames8, K).items()
           if k != "detections"}

    sharded = _make_pipeline("rgb")
    sharded.yolo_variables = pipe.yolo_variables
    sharded.pose_variables = pipe.pose_variables
    sharded = sharded.shard(make_mesh((4, 2)))
    sharded._folded = pipe._folded  # same folded trees
    out = sharded(frames8, K)
    assert len(out["rotation"].sharding.device_set) == 8
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), ref[k], rtol=1e-3, atol=1e-4, err_msg=k
        )
