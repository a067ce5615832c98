"""Native C++ LineMOD yaml parser: equivalence with PyYAML + index parity."""

import os
import time

import numpy as np
import pytest
import yaml

from pose6d_tpu.data import _native
from pose6d_tpu.data.linemod import build_index
from pose6d_tpu.data.synthetic import generate_synthetic_linemod


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("linemod_native")
    return generate_synthetic_linemod(str(root), obj_ids=(1, 2), frames_per_obj=20, seed=9)


@pytest.fixture(scope="module")
def lib_available():
    if _native.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    return True


def test_parse_gt_matches_pyyaml(synth, lib_available):
    gt_path = os.path.join(synth["data"], "01", "gt.yml")
    ours = _native.parse_gt(gt_path)
    with open(gt_path) as f:
        ref = yaml.safe_load(f)
    assert ours is not None
    assert set(ours) == set(ref)
    for frame in ref:
        assert len(ours[frame]) == len(ref[frame])
        for a, b in zip(ours[frame], ref[frame]):
            assert a["obj_id"] == int(b["obj_id"])
            np.testing.assert_allclose(a["obj_bb"], b["obj_bb"], rtol=1e-12)
            np.testing.assert_allclose(a["cam_R_m2c"], b["cam_R_m2c"], rtol=1e-12)
            np.testing.assert_allclose(a["cam_t_m2c"], b["cam_t_m2c"], rtol=1e-12)


def test_parse_info_matches_pyyaml(synth, lib_available):
    info_path = os.path.join(synth["data"], "02", "info.yml")
    ours = _native.parse_info(info_path)
    with open(info_path) as f:
        ref = yaml.safe_load(f)
    assert ours is not None and set(ours) == set(ref)
    for frame in ref:
        np.testing.assert_allclose(ours[frame]["cam_K"], ref[frame]["cam_K"], rtol=1e-12)


def test_parse_multiline_flow_list(tmp_path, lib_available):
    # PyYAML-style wrapped lists must parse identically
    p = tmp_path / "gt.yml"
    p.write_text(
        "3:\n"
        "- cam_R_m2c: [0.1, 0.2, 0.3,\n"
        "    0.4, 0.5, 0.6, 0.7,\n"
        "    0.8, 0.9]\n"
        "  cam_t_m2c: [1.0, 2.0, 3.0]\n"
        "  obj_bb: [10, 20, 30, 40]\n"
        "  obj_id: 5\n"
    )
    out = _native.parse_gt(str(p))
    assert out is not None and 3 in out
    np.testing.assert_allclose(out[3][0]["cam_R_m2c"], np.arange(1, 10) / 10.0)
    assert out[3][0]["obj_id"] == 5


def test_parse_missing_file(lib_available):
    assert _native.parse_gt("/nonexistent/gt.yml") is None


def test_index_native_matches_yaml(synth):
    native_idx = build_index(synth["data"], "train", use_native=True)
    yaml_idx = build_index(synth["data"], "train", use_native=False)
    assert len(native_idx) == len(yaml_idx)
    for a, b in zip(native_idx, yaml_idx):
        assert a.img_path == b.img_path and a.obj_id == b.obj_id
        np.testing.assert_allclose(a.bbox, b.bbox, rtol=1e-12)
        np.testing.assert_allclose(a.rot_mat, b.rot_mat, rtol=1e-12)
        np.testing.assert_allclose(a.trans_mm, b.trans_mm, rtol=1e-12)
        np.testing.assert_allclose(a.cam_K, b.cam_K, rtol=1e-6)


def test_native_is_faster(synth, lib_available):
    gt_path = os.path.join(synth["data"], "01", "gt.yml")
    t0 = time.perf_counter()
    for _ in range(20):
        _native.parse_gt(gt_path)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        with open(gt_path) as f:
            yaml.safe_load(f)
    t_yaml = time.perf_counter() - t0
    assert t_native < t_yaml, (t_native, t_yaml)
