"""Synthetic LineMOD-format dataset generator.

The real LineMOD download is ~2 GB; this writes a tiny, geometrically
consistent dataset tree in the exact on-disk format the index scanner and
datasets expect (data/{NN}/{rgb,depth}/*.png + gt.yml + info.yml, and
models/obj_NN.ply + models_info.yml), so train/eval integration tests run
hermetically. Objects are colored cuboids rendered as filled projected
silhouettes; depth maps carry the object's Z at its silhouette; bboxes are
the projected-point extents.
"""

from __future__ import annotations

import os

import numpy as np

from ..geometry.pinhole import DEFAULT_K


def _write_ply(path: str, pts_mm: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts_mm)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts_mm:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


# 20 well-separated marker colors (12 edges + 8 corners), fixed across frames
# so pose is identifiable from appearance
_MARKER_COLORS = [
    (255, 40, 40), (40, 255, 40), (40, 40, 255), (255, 255, 40),
    (255, 40, 255), (40, 255, 255), (255, 140, 0), (140, 255, 0),
    (0, 140, 255), (140, 0, 255), (255, 255, 255), (160, 160, 160),
    (200, 80, 80), (80, 200, 80), (80, 80, 200), (220, 220, 80),
    (220, 80, 220), (80, 220, 220), (240, 170, 90), (170, 90, 240),
]


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    # QR of a Gaussian matrix, sign-fixed -> uniform-ish rotation
    a = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _bounded_rotation(rng: np.random.Generator, max_angle_deg: float) -> np.ndarray:
    """Rotation uniformly-distributed-in-axis within a geodesic ball of
    `max_angle_deg` around identity.

    Mirrors real capture setups (LineMOD objects are seen from a bounded
    viewing range, not all of SO(3)). Bounded sampling also keeps the task
    inside what continuous quaternion regression can represent: a single-
    valued continuous map cannot cover all of SO(3) (quaternion double
    cover), so uniform-SO(3) fixtures have an irreducible error floor that
    real LineMOD data never exhibits."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = np.deg2rad(rng.uniform(0.0, max_angle_deg))
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1.0 - np.cos(angle)) * (K @ K)


def _symmetric_color_maps():
    """Marker-color index maps making a cuboid's appearance invariant under
    the object-frame symmetry S = R_z(180deg), which maps corner (sx, sy, sz)
    to (-sx, -sy, sz) — corner index i -> i ^ 0b110. Paired corners/edges
    share a color, so the renders of pose R and R@S are pixel-identical:
    the GT quaternion becomes ambiguous exactly like LineMOD's eggbox/glue,
    and only ADD-S (reference models/add_loss.py:193-195) scores it fairly."""
    sigma = lambda i: i ^ 0b110
    edges = [
        (a, b) for a in range(8) for b in range(a + 1, 8)
        if bin(a ^ b).count("1") == 1
    ]
    edge_color = []
    for ei, (a, b) in enumerate(edges):
        mate = edges.index(tuple(sorted((sigma(a), sigma(b)))))
        edge_color.append(min(ei, mate))
    corner_color = [min(ci, sigma(ci)) for ci in range(8)]
    return edge_color, corner_color


def _render_frame(
    rng: np.random.Generator,
    corners_m: np.ndarray,  # [8, 3] cuboid corners, meters
    K: np.ndarray,
    color: tuple,
    edge_cmap: list,
    corner_cmap: list,
    img_w: int,
    img_h: int,
    max_angle_deg: float,
    R_m2c: np.ndarray = None,
    t_m: np.ndarray = None,
):
    """Render one frame (rgb uint8, depth uint16 mm, bbox) at a random —
    or, for tests, a given — pose. Consumes the SAME rng sequence as the
    pre-refactor inline code, so fixtures are bit-identical across rounds."""
    import cv2

    if R_m2c is None:
        R_m2c = (
            _bounded_rotation(rng, max_angle_deg)
            if max_angle_deg > 0
            else _random_rotation(rng)
        )
    if t_m is None:
        t_m = np.array(
            [rng.uniform(-0.08, 0.08), rng.uniform(-0.06, 0.06), rng.uniform(0.6, 1.1)]
        )
    cam_pts = corners_m @ R_m2c.T + t_m
    z = np.clip(cam_pts[:, 2], 1e-3, None)
    u = cam_pts[:, 0] * K[0, 0] / z + K[0, 2]
    v = cam_pts[:, 1] * K[1, 1] / z + K[1, 2]

    x0, x1p = int(np.floor(u.min())), int(np.ceil(u.max()))
    y0, y1p = int(np.floor(v.min())), int(np.ceil(v.max()))
    bbox = [x0, y0, x1p - x0, y1p - y0]

    rgb = rng.integers(0, 60, size=(img_h, img_w, 3), dtype=np.uint8)
    hull = cv2.convexHull(np.stack([u, v], axis=1).astype(np.int32))
    cv2.fillConvexPoly(rgb, hull, color)
    # orientation must be fully observable for rotation learning: draw the
    # 12 wireframe edges and 8 corner dots in fixed colors (shared within
    # symmetry pairs for symmetric objects), far-to-near so occlusion is
    # depth-consistent
    edges = [
        (a, b) for a in range(8) for b in range(a + 1, 8)
        if bin(a ^ b).count("1") == 1
    ]
    order = np.argsort(-(z[[a for a, _ in edges]] + z[[b for _, b in edges]]))
    for ei in order:
        a, b = edges[ei]
        cv2.line(
            rgb, (int(u[a]), int(v[a])), (int(u[b]), int(v[b])),
            _MARKER_COLORS[edge_cmap[ei]], 2,
        )
    for ci in np.argsort(-z):
        cv2.circle(
            rgb, (int(u[ci]), int(v[ci])), 4,
            _MARKER_COLORS[12 + corner_cmap[ci]], -1,
        )

    depth = np.zeros((img_h, img_w), dtype=np.uint16)
    mask = np.zeros((img_h, img_w), dtype=np.uint8)
    cv2.fillConvexPoly(mask, hull, 1)
    depth[mask > 0] = int(t_m[2] * 1000.0)
    return rgb, depth, bbox, R_m2c, t_m


def generate_synthetic_linemod(
    root: str,
    obj_ids: tuple = (1, 2),
    frames_per_obj: int = 20,
    img_w: int = 640,
    img_h: int = 480,
    seed: int = 0,
    max_angle_deg: float = 0.0,
    symmetric_obj_ids: tuple = (10, 11),
) -> dict:
    """Write a synthetic dataset under `root`; returns paths dict.

    `max_angle_deg` > 0 bounds rotations to a geodesic ball of that radius
    (realistic bounded viewing range, see _bounded_rotation); 0 keeps the
    default uniform-SO(3) sampling.

    Objects whose FOLDER id is in `symmetric_obj_ids` render with
    180-degree-symmetric marker colors (see _symmetric_color_maps). The
    default (10, 11) matches LineMOD's eggbox/glue folders — 0-indexed
    object ids 9/10, the reference's SYMMETRIC_OBJECT_IDS
    (models/add_loss.py:10) — so including those folders in `obj_ids`
    exercises the ADD-S-for-symmetric decision path at system level.

    Calling this again with DIFFERENT obj_ids under the same root adds the
    new object folders and merges models_info.yml (incremental extension of
    an existing fixture)."""
    import cv2

    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "data")
    model_dir = os.path.join(root, "models")
    os.makedirs(model_dir, exist_ok=True)

    K = DEFAULT_K

    info_lines = []
    for oi, obj_id in enumerate(obj_ids):
        # size keyed off the FOLDER id (not enumeration order) so folders
        # keep their geometry when a fixture is extended incrementally;
        # identical to the old 35 + 12*oi for contiguous 1..N trees
        half_mm = 35.0 + 12.0 * ((obj_id - 1) % 8)  # cuboid half-extent, mm
        n_pts = 800
        pts_mm = rng.uniform(-half_mm, half_mm, size=(n_pts, 3))
        _write_ply(os.path.join(model_dir, f"obj_{obj_id:02d}.ply"), pts_mm)
        diameter_mm = 2.0 * half_mm * np.sqrt(3.0)
        info_lines.append(f"{obj_id}: {{diameter: {diameter_mm:.3f}}}\n")

        obj_dir = os.path.join(data_dir, f"{obj_id:02d}")
        rgb_dir = os.path.join(obj_dir, "rgb")
        depth_dir = os.path.join(obj_dir, "depth")
        os.makedirs(rgb_dir, exist_ok=True)
        os.makedirs(depth_dir, exist_ok=True)

        corners_m = (
            np.array(
                [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                dtype=np.float64,
            )
            * half_mm
            / 1000.0
        )

        gt_entries = []
        info_entries = []
        color = tuple(int(c) for c in rng.integers(80, 255, size=3))
        symmetric = obj_id in symmetric_obj_ids
        if symmetric:
            edge_cmap, corner_cmap = _symmetric_color_maps()
        else:
            edge_cmap, corner_cmap = list(range(12)), list(range(8))

        for frame in range(frames_per_obj):
            rgb, depth, bbox, R_m2c, t_m = _render_frame(
                rng, corners_m, K, color, edge_cmap, corner_cmap,
                img_w, img_h, max_angle_deg,
            )

            # cv2 writes BGR; the loader converts back, so store BGR of our RGB
            cv2.imwrite(os.path.join(rgb_dir, f"{frame:04d}.png"), rgb[:, :, ::-1])
            cv2.imwrite(os.path.join(depth_dir, f"{frame:04d}.png"), depth)

            gt_entries.append(
                (frame, R_m2c.flatten().tolist(), (t_m * 1000.0).tolist(), bbox, obj_id)
            )
            info_entries.append((frame, K.flatten().tolist()))

        with open(os.path.join(obj_dir, "gt.yml"), "w") as f:
            for frame, rmat, tmm, bbox, oid in gt_entries:
                f.write(f"{frame}:\n")
                f.write(f"- cam_R_m2c: {rmat}\n")
                f.write(f"  cam_t_m2c: {tmm}\n")
                f.write(f"  obj_bb: {bbox}\n")
                f.write(f"  obj_id: {oid}\n")

        with open(os.path.join(obj_dir, "info.yml"), "w") as f:
            for frame, kflat in info_entries:
                f.write(f"{frame}:\n")
                f.write(f"  cam_K: {kflat}\n")
                f.write("  depth_scale: 1.0\n")

    # merge with any existing models_info.yml so the fixture can be extended
    # incrementally (new object folders added to an existing tree)
    info_path = os.path.join(model_dir, "models_info.yml")
    merged = {}
    if os.path.exists(info_path):
        with open(info_path) as f:
            for line in f:
                if ":" in line:
                    merged[int(line.split(":")[0])] = line
    for line in info_lines:
        merged[int(line.split(":")[0])] = line
    with open(info_path, "w") as f:
        f.writelines(merged[k] for k in sorted(merged))

    return {"data": data_dir, "models": model_dir}
