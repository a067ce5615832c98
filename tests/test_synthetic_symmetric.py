"""Symmetric objects in the synthetic fixture (LineMOD eggbox/glue analogue).

Folders 10/11 (0-indexed object ids 9/10 — the reference's
SYMMETRIC_OBJECT_IDS, models/add_loss.py:10) render with marker colors
invariant under the object-frame symmetry R_z(180deg): the GT pose becomes
visually ambiguous up to that flip, exactly like the real eggbox/glue, so
only the ADD-S decision path (add_loss.py:193-195) scores a flipped-pose
prediction as correct. These tests pin the render-level invariance and the
metric-level consequence.
"""

import numpy as np
import pytest

from pose6d_tpu.data.synthetic import (
    _MARKER_COLORS,
    _render_frame,
    _symmetric_color_maps,
    generate_synthetic_linemod,
)

S_Z180 = np.diag([-1.0, -1.0, 1.0])  # object-frame 180-deg rotation about z


def test_symmetric_color_maps_pair_under_flip():
    edge_cmap, corner_cmap = _symmetric_color_maps()
    sigma = lambda i: i ^ 0b110
    edges = [
        (a, b) for a in range(8) for b in range(a + 1, 8)
        if bin(a ^ b).count("1") == 1
    ]
    for ci in range(8):
        assert corner_cmap[ci] == corner_cmap[sigma(ci)]
    for ei, (a, b) in enumerate(edges):
        mate = edges.index(tuple(sorted((sigma(a), sigma(b)))))
        assert edge_cmap[ei] == edge_cmap[mate]
    # the symmetric palette still separates the two corner orbits enough to
    # leave SOME orientation signal (4 distinct corner colors, 8 edge colors)
    assert len(set(corner_cmap)) == 4
    assert len(set(edge_cmap)) >= 6


def _corners(half_mm=40.0):
    return (
        np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            dtype=np.float64,
        )
        * half_mm
        / 1000.0
    )


def _make_pose(seed=7):
    from pose6d_tpu.data.synthetic import _bounded_rotation

    rng = np.random.default_rng(seed)
    R = _bounded_rotation(rng, 60.0)
    t = np.array([0.01, -0.02, 0.8])
    return R, t


def test_render_invariant_under_flip_only_with_symmetric_colors():
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    corners = _corners()
    R, t = _make_pose()
    color = (120, 130, 140)

    def render(cmaps, Rm):
        edge_cmap, corner_cmap = cmaps
        rgb, depth, bbox, _, _ = _render_frame(
            np.random.default_rng(3), corners, K, color, edge_cmap,
            corner_cmap, 320, 240, 0.0, R_m2c=Rm, t_m=t,
        )
        return rgb, depth, bbox

    sym = _symmetric_color_maps()
    ident = (list(range(12)), list(range(8)))

    rgb_a, depth_a, bbox_a = render(sym, R)
    rgb_b, depth_b, bbox_b = render(sym, R @ S_Z180)
    # symmetric colors: the flipped pose renders pixel-identically
    assert bbox_a == bbox_b
    np.testing.assert_array_equal(rgb_a, rgb_b)
    np.testing.assert_array_equal(depth_a, depth_b)

    rgb_c, _, _ = render(ident, R)
    rgb_d, _, _ = render(ident, R @ S_Z180)
    # distinct colors: the flip is visible
    assert np.any(rgb_c != rgb_d)


def test_addsymmetric_metric_accepts_flipped_pose(tmp_path):
    """System-level: a generated symmetric object is marked symmetric by the
    evaluator, and a 180-flipped prediction scores ~0 ADD-S (correct under
    ADD-0.1d) while its plain ADD is far above threshold."""
    import jax.numpy as jnp

    from pose6d_tpu.losses.add import ADDEvaluator, add_metrics

    paths = generate_synthetic_linemod(
        str(tmp_path), obj_ids=(1, 10), frames_per_obj=2, seed=2,
        img_w=320, img_h=240,
    )
    ev = ADDEvaluator(paths["models"])
    assert bool(ev.host_models.symmetric[9]) is True
    assert bool(ev.host_models.symmetric[0]) is False
    assert bool(ev.host_models.present[9]) is True

    R, t = _make_pose()
    gt_R = jnp.asarray(R)[None]
    pred_R = jnp.asarray(R @ S_Z180)[None]
    tt = jnp.asarray(t, jnp.float32)[None]

    def metrics(oid):
        return {
            k: float(v)
            for k, v in add_metrics(
                ev.points, ev.diameters, ev.symmetric, ev.present,
                pred_R, tt, gt_R, tt, jnp.asarray([oid]),
                num_valid=ev.num_valid,
            ).items()
        }

    m_sym = metrics(9)  # folder 10 -> 0-indexed 9
    m_reg = metrics(0)  # folder 01 -> 0-indexed 0
    # flipped prediction: large point-to-point error either way
    assert m_sym["add_mean"] > 20.0  # mm
    # but nearest-neighbor error is small for the symmetric cuboid cloud
    assert m_sym["add_s_mean"] < 0.1 * float(ev.diameters[9]) * 1000.0
    assert m_sym["add_01d_acc"] == 100.0
    # the non-symmetric object is judged on plain ADD -> wrong
    assert m_reg["add_01d_acc"] == 0.0
