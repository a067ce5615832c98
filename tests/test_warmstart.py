"""graft_towers (train/warmstart.py): tower scopes move from a donor's
trained variables into a fresh init, everything else stays untouched.
This is the fixture-native analogue of the reference's ImageNet tower
init (reference scripts/training/train_rgbd.py: pretrained=True)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose6d_tpu.train.loop import TrainConfig, create_train_state
from pose6d_tpu.train.warmstart import graft_towers


def _variables(variant, seed, fusion_attention=True):
    cfg = TrainConfig(variant=variant, img_size=64, batch_size=2,
                      fusion_attention=fusion_attention)
    _, _, state = create_train_state(cfg, jax.random.key(seed))
    return {"params": state.params, "batch_stats": state.batch_stats}


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb)
    )


def test_graft_dual_tower_donor():
    """rgbd_noattn donor -> rgbd target: both towers graft by exact name;
    heads/attention keep the fresh init."""
    target = _variables("rgbd", seed=0)
    donor = _variables("rgbd", seed=1, fusion_attention=False)
    new, grafted = graft_towers(target, donor)
    assert sorted(grafted) == [
        "depth_backbone<-depth_backbone[params+batch_stats]",
        "rgb_backbone<-rgb_backbone[params+batch_stats]",
    ]
    for scope in ("rgb_backbone", "depth_backbone"):
        for coll in ("params", "batch_stats"):
            assert _trees_equal(new[coll][scope], donor[coll][scope]), (coll, scope)
    # non-tower scopes untouched (attention exists only in the target)
    head_scopes = [s for s in target["params"] if "backbone" not in s]
    assert head_scopes
    for s in head_scopes:
        assert _trees_equal(new["params"][s], target["params"][s]), s
    # pure surgery: the input trees are not mutated (different seeds =>
    # different conv kernels)
    assert not _trees_equal(target["params"]["rgb_backbone"],
                            donor["params"]["rgb_backbone"])


def test_graft_single_tower_alias():
    """rgb donor (scope 'backbone') warm-starts the rgbd RGB tower via the
    alias; the depth tower stays at the fresh init (donor has none)."""
    target = _variables("rgbd", seed=0)
    donor = _variables("rgb", seed=2)
    new, grafted = graft_towers(target, donor)
    assert grafted == ["rgb_backbone<-backbone[params+batch_stats]"]
    assert _trees_equal(new["params"]["rgb_backbone"],
                        donor["params"]["backbone"])
    assert _trees_equal(new["params"]["depth_backbone"],
                        target["params"]["depth_backbone"])


def test_graft_mismatch_raises():
    donor = {"params": {"not_a_tower": {}}, "batch_stats": {}}
    with pytest.raises(ValueError):
        graft_towers(_variables("rgb", seed=0), donor)


def test_graft_refuses_params_without_batch_stats():
    """A donor carrying tower params but no matching BN running stats would
    silently pair trained convs with fresh statistics — must raise."""
    target = _variables("rgb", seed=0)
    donor = _variables("rgb", seed=1)
    donor["batch_stats"] = {}  # simulate a stats-less donor tree
    with pytest.raises(ValueError, match="batch_stats"):
        graft_towers(target, donor)
