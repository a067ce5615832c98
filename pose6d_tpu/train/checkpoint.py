"""Orbax checkpointing with the reference's last/best policy.

The reference saves {epoch, model, optimizer, best_acc, curr_acc, curr_add}
to last_pose_model.pth every epoch and mirrors to best_pose_model.pth when
val ADD-0.1d improves, restoring model+optimizer+epoch+best on resume
(scripts/training/train_rgb.py:80-90,146-162). We reproduce that policy and
additionally checkpoint the plateau-scheduler state, which the reference
loses on resume (its plateau counters silently reset).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

LAST_NAME = "last"
BEST_NAME = "best"
# best by the DEPLOYMENT-ALIGNED val metric (pinhole-corrected X/Y; see
# train/loop.make_eval_step): the reference's selection rule stays `best`
# for parity, this third checkpoint quantifies the selection mismatch
BEST_DEPLOY_NAME = "best_deploy"


class CheckpointManager:
    def __init__(self, save_dir: str):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def save(self, state: Any, epoch: int, best_acc: float, curr_acc: float,
             curr_add: float, scheduler_state: dict, is_best: bool,
             best_deploy_acc: float = 0.0, is_best_deploy: bool = False) -> None:
        # 0-d ndarrays, not numpy scalars: orbax's restore type-dispatch
        # rejects bare np.float32/np.int32 scalar instances
        payload = {
            "state": state,
            "meta": {
                "epoch": np.asarray(epoch, np.int32),
                "best_acc": np.asarray(best_acc, np.float32),
                "best_deploy_acc": np.asarray(best_deploy_acc, np.float32),
                "curr_acc": np.asarray(curr_acc, np.float32),
                "curr_add": np.asarray(curr_add, np.float32),
            },
            "scheduler": {k: np.asarray(v, np.float64) for k, v in scheduler_state.items()},
        }
        self._ckptr.save(self._path(LAST_NAME), payload, force=True)
        if is_best:
            payload["meta"]["best_acc"] = np.asarray(curr_acc, np.float32)
            self._ckptr.save(self._path(BEST_NAME), payload, force=True)
        if is_best_deploy:
            self._ckptr.save(self._path(BEST_DEPLOY_NAME), payload, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, abstract_state: Any, name: str = LAST_NAME) -> Optional[dict]:
        """Restore; returns None if no checkpoint exists or structure mismatches
        (the reference degrades to a fresh start on mismatch, train_rgb.py:89-90)."""
        path = self._path(name)
        if not os.path.isdir(path):
            return None
        abstract = {
            "state": jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state),
            "meta": {
                "epoch": np.asarray(0, np.int32),
                "best_acc": np.asarray(0, np.float32),
                "best_deploy_acc": np.asarray(0, np.float32),
                "curr_acc": np.asarray(0, np.float32),
                "curr_add": np.asarray(0, np.float32),
            },
            "scheduler": {
                "lr": np.asarray(0, np.float64),
                "best": np.asarray(0, np.float64),
                "num_bad_epochs": np.asarray(0, np.float64),
                "cooldown_counter": np.asarray(0, np.float64),
            },
        }
        try:
            return self._ckptr.restore(path, abstract)
        except Exception as e:  # architecture mismatch -> fresh start
            print(f"Checkpoint restore failed ({e}); starting fresh")
            return None

    def has_checkpoint(self, name: str = LAST_NAME) -> bool:
        return os.path.isdir(self._path(name))


def load_model_variables(save_dir: str, train_cfg, name: str = BEST_NAME) -> Optional[dict]:
    """Restore a trained PoseNet's inference variables from a Trainer
    checkpoint dir: returns {'params', 'batch_stats'} or None."""
    from .loop import create_train_state

    _, _, abstract = create_train_state(train_cfg, jax.random.key(0))
    mgr = CheckpointManager(save_dir)
    restored = mgr.restore(abstract, name=name)
    if restored is None and name != LAST_NAME:
        restored = mgr.restore(abstract, name=LAST_NAME)
    if restored is None:
        return None
    state = restored["state"]
    return {"params": state.params, "batch_stats": state.batch_stats}
