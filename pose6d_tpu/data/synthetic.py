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


def _draw_cuboid(
    rgb: np.ndarray,
    depth: np.ndarray,
    corners_m: np.ndarray,
    K: np.ndarray,
    color: tuple,
    edge_cmap: list,
    corner_cmap: list,
    R_m2c: np.ndarray,
    t_m: np.ndarray,
):
    """Draw one posed cuboid into existing rgb/depth canvases (in place);
    returns its bbox. Pure drawing — no rng — so single-object frames and
    composited multi-object scenes share the exact cv2 op sequence. Nearer
    objects must be drawn LAST (caller sorts far-to-near) for consistent
    occlusion in both buffers."""
    import cv2

    cam_pts = corners_m @ R_m2c.T + t_m
    z = np.clip(cam_pts[:, 2], 1e-3, None)
    u = cam_pts[:, 0] * K[0, 0] / z + K[0, 2]
    v = cam_pts[:, 1] * K[1, 1] / z + K[1, 2]

    x0, x1p = int(np.floor(u.min())), int(np.ceil(u.max()))
    y0, y1p = int(np.floor(v.min())), int(np.ceil(v.max()))
    bbox = [x0, y0, x1p - x0, y1p - y0]

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

    mask = np.zeros(depth.shape, dtype=np.uint8)
    cv2.fillConvexPoly(mask, hull, 1)
    depth[mask > 0] = int(t_m[2] * 1000.0)
    return bbox


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
    rgb = rng.integers(0, 60, size=(img_h, img_w, 3), dtype=np.uint8)
    depth = np.zeros((img_h, img_w), dtype=np.uint16)
    bbox = _draw_cuboid(
        rgb, depth, corners_m, K, color, edge_cmap, corner_cmap, R_m2c, t_m
    )
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


def recover_object_colors(data_dir: str) -> dict:
    """Recover each object folder's silhouette fill color from its rendered
    frames — exactly, by the generator's own color rules: background noise
    has every channel < 60, fill colors have every channel >= 80, and the
    only other >= 80 pixels are the fixed _MARKER_COLORS (drawn as thin
    lines/dots, always a minority of the silhouette). Lets multi-object
    scenes (generate_synthetic_scene) be composed with the SAME appearances
    a detector was trained on, without replaying the fixture's rng.

    Returns {obj_id (1-indexed folder id): (r, g, b)}."""
    import cv2

    marker = {tuple(c) for c in _MARKER_COLORS}
    colors = {}
    for folder in sorted(os.listdir(data_dir)):
        rgb_dir = os.path.join(data_dir, folder, "rgb")
        if not (folder.isdigit() and os.path.isdir(rgb_dir)):
            continue
        frame = sorted(os.listdir(rgb_dir))[0]
        img = cv2.imread(os.path.join(rgb_dir, frame))[:, :, ::-1]  # BGR->RGB
        cand = img[(img >= 80).all(axis=-1)]
        vals, counts = np.unique(cand.reshape(-1, 3), axis=0, return_counts=True)
        for i in np.argsort(-counts):
            c = tuple(int(v) for v in vals[i])
            if c not in marker:
                colors[int(folder)] = c
                break
    return colors


def generate_synthetic_scene(
    root: str,
    object_colors: dict,
    frames: int = 20,
    img_w: int = 640,
    img_h: int = 480,
    seed: int = 7,
    max_angle_deg: float = 0.0,
    scene_folder: int = 1,
    symmetric_obj_ids: tuple = (10, 11),
    write_models: bool = True,
) -> dict:
    """Write MULTI-OBJECT scene frames in the LineMOD on-disk format: one
    data/<scene_folder> tree whose gt.yml lists one annotation per object
    per frame — the layout of real LineMOD's folder 02, where the reference
    dataset filters per-folder but a deployed system sees every object
    (reference scripts/inference/inference_rgb.py:70 loops over all
    detections). Consumed by build_frame_index + eval_e2e --max-objects.

    object_colors: {obj_id (1-indexed): (r, g, b) fill color} — pass
    recover_object_colors(single_object_data_dir) so each object keeps the
    appearance a detector/pose net was trained on. Geometry (cuboid
    half-extent, symmetry color maps) derives from obj_id by the same rules
    as generate_synthetic_linemod, so poses remain comparable.

    Every frame composites ALL objects, far-to-near (consistent RGB and
    depth occlusion), each in its own jittered cell of a translation grid so
    silhouettes mostly separate. write_models regenerates PLY clouds /
    models_info.yml under root/models (fresh random point sets — same
    object geometry, NOT the same cloud as another fixture's models dir;
    evaluate against the original mesh dir when pairing with a trained
    system)."""
    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "data")
    model_dir = os.path.join(root, "models")
    obj_ids = sorted(object_colors)

    obj_dir = os.path.join(data_dir, f"{scene_folder:02d}")
    rgb_dir = os.path.join(obj_dir, "rgb")
    depth_dir = os.path.join(obj_dir, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    K = DEFAULT_K
    specs = {}
    info_lines = []
    for obj_id in obj_ids:
        half_mm = 35.0 + 12.0 * ((obj_id - 1) % 8)
        corners_m = (
            np.array(
                [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                dtype=np.float64,
            )
            * half_mm
            / 1000.0
        )
        if obj_id in symmetric_obj_ids:
            edge_cmap, corner_cmap = _symmetric_color_maps()
        else:
            edge_cmap, corner_cmap = list(range(12)), list(range(8))
        specs[obj_id] = (corners_m, edge_cmap, corner_cmap)
        if write_models:
            os.makedirs(model_dir, exist_ok=True)
            pts_mm = rng.uniform(-half_mm, half_mm, size=(800, 3))
            _write_ply(os.path.join(model_dir, f"obj_{obj_id:02d}.ply"), pts_mm)
            diameter_mm = 2.0 * half_mm * np.sqrt(3.0)
            info_lines.append(f"{obj_id}: {{diameter: {diameter_mm:.3f}}}\n")

    # translation grid: one cell per object, shuffled per frame
    n = len(obj_ids)
    gx = int(np.ceil(np.sqrt(n)))
    gy = int(np.ceil(n / gx))
    xs = np.linspace(-0.13, 0.13, gx) if gx > 1 else np.zeros(1)
    ys = np.linspace(-0.10, 0.10, gy) if gy > 1 else np.zeros(1)
    cells = [(x, y) for y in ys for x in xs]

    import cv2

    gt_yaml, info_yaml = [], []
    for frame in range(frames):
        rgb = rng.integers(0, 60, size=(img_h, img_w, 3), dtype=np.uint8)
        depth = np.zeros((img_h, img_w), dtype=np.uint16)
        order = rng.permutation(n)
        poses = []
        for slot, oi in enumerate(order):
            obj_id = obj_ids[oi]
            R_m2c = (
                _bounded_rotation(rng, max_angle_deg)
                if max_angle_deg > 0
                else _random_rotation(rng)
            )
            cx, cy = cells[slot]
            t_m = np.array(
                [
                    cx + rng.uniform(-0.02, 0.02),
                    cy + rng.uniform(-0.02, 0.02),
                    rng.uniform(0.65, 1.1),
                ]
            )
            poses.append((obj_id, R_m2c, t_m))
        annos = []
        for obj_id, R_m2c, t_m in sorted(poses, key=lambda p: -p[2][2]):
            corners_m, edge_cmap, corner_cmap = specs[obj_id]
            bbox = _draw_cuboid(
                rgb, depth, corners_m, K, object_colors[obj_id],
                edge_cmap, corner_cmap, R_m2c, t_m,
            )
            annos.append((obj_id, R_m2c, t_m, bbox))
        cv2.imwrite(os.path.join(rgb_dir, f"{frame:04d}.png"), rgb[:, :, ::-1])
        cv2.imwrite(os.path.join(depth_dir, f"{frame:04d}.png"), depth)

        gt_yaml.append(f"{frame}:\n")
        for obj_id, R_m2c, t_m, bbox in sorted(annos, key=lambda a: a[0]):
            gt_yaml.append(f"- cam_R_m2c: {R_m2c.flatten().tolist()}\n")
            gt_yaml.append(f"  cam_t_m2c: {(t_m * 1000.0).tolist()}\n")
            gt_yaml.append(f"  obj_bb: {bbox}\n")
            gt_yaml.append(f"  obj_id: {obj_id}\n")
        info_yaml.append(f"{frame}:\n")
        info_yaml.append(f"  cam_K: {K.flatten().tolist()}\n")
        info_yaml.append("  depth_scale: 1.0\n")

    with open(os.path.join(obj_dir, "gt.yml"), "w") as f:
        f.writelines(gt_yaml)
    with open(os.path.join(obj_dir, "info.yml"), "w") as f:
        f.writelines(info_yaml)

    if write_models:
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
