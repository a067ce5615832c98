"""Device mesh construction and sharding rules (dp + tp over ICI).

The reference is strictly single-device (SURVEY §2.3: no DP/TP/PP anywhere;
the only device logic is `.to(device)`). The TPU-native design scales the
same workload across a `jax.sharding.Mesh` with XLA GSPMD inserting the
collectives:

  - data axis:  batches sharded over 'data'; gradient all-reduce (psum) and
    cross-device BatchNorm statistics come from XLA automatically.
  - model axis: the wide head MLPs (2048x2048 Dense, reference
    pose_net_rgb.py:23-50) are sharded Megatron-style — alternating
    column-parallel P(None, 'model') / row-parallel P('model', None) kernels
    so activations stay sharded between the two and XLA inserts a single
    psum at the row-parallel output.

Conv backbones stay replicated: at ResNet50 scale, weight replication +
batch sharding is the speed-of-light layout (params ~100 MB << HBM, and
replicated weights avoid any per-step weight collectives).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a (data, model) mesh. Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)

def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put every array leaf with its batch dim over 'data'."""
    sh = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)

# Megatron-style TP for the head MLPs: column-parallel on even dense layers,
# row-parallel on odd ones. Matches the naming in models/posenet.py
# (rot_dense0, trans_dense1, fusion_dense0, z_dense0, ...).
_TP_COL = re.compile(r"(rot|trans|fusion|z)_dense0$")
_TP_ROW = re.compile(r"(rot|trans|fusion|z)_dense1$")

def param_spec(path: Tuple[str, ...], value: jax.Array, tp: bool) -> P:
    """PartitionSpec for one parameter, given its flattened path."""
    if not tp or value.ndim == 0:
        return P()
    name = path[-2] if len(path) >= 2 else ""
    leaf = path[-1]
    if _TP_COL.search(name):
        if leaf == "kernel" and value.ndim == 2:
            return P(None, MODEL_AXIS)
        if leaf in ("bias", "scale", "mean", "var") and value.ndim == 1:
            return P(MODEL_AXIS)
    elif _TP_ROW.search(name):
        if leaf == "kernel" and value.ndim == 2:
            return P(MODEL_AXIS, None)
        # bias/norm of a row-parallel layer live on the full output: replicate
    return P()

def shard_params(tree: Any, mesh: Mesh, tp: Optional[bool] = None) -> Any:
    """device_put a parameter tree with dp-replicated / tp-sharded layout."""
    if tp is None:
        tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)

    def key_str(k):
        return getattr(k, "key", getattr(k, "name", str(k)))

    out = []
    for path, v in flat:
        spec = param_spec(tuple(key_str(k) for k in path), v, tp)
        out.append(jax.device_put(v, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)

def shard_state(state: Any, mesh: Mesh, tp: Optional[bool] = None) -> Any:
    """Shard a TrainState: params/opt_state tp-sharded, everything else
    replicated. optax state mirrors the param tree structure, so the same
    path rules apply to Adam's mu/nu moments."""

    from ..train.loop import TrainState

    assert isinstance(state, TrainState)
    return TrainState(
        params=shard_params(state.params, mesh, tp),
        batch_stats=shard_params(state.batch_stats, mesh, tp=False),
        opt_state=shard_params(state.opt_state, mesh, tp),
        step=jax.device_put(state.step, replicated(mesh)),
    )
