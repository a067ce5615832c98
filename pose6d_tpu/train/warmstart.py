"""Warm-starting pose-net towers from a trained donor checkpoint.

The reference initializes every ResNet tower from ImageNet weights
(reference scripts/training/train_rgbd.py: torchvision ``pretrained=True``;
the depth branch sums conv1 over RGB). With no egress for ImageNet weights
in this environment, the fixture-native analogue grafts TRAINED towers from
a donor fixture run into a fresh init — the experimental arm that tests
the rgbd-stall hypothesis "the attention pathway stalls from scratch but
not from a pretrained basin" (PARITY_RESULTS.md, diagnosis section).

Pure tree surgery: no device work, no optimizer coupling (Adam moments are
zero at step 0, so grafting params before the first step is exact).
"""

from typing import Dict, List, Tuple

# tower scopes a PoseNet variant may own (models/posenet.py)
_TOWER_SCOPES = ("backbone", "rgb_backbone", "depth_backbone")
# a single-tower donor ("backbone": rgb/rgb_geometric/rgbd_geometric) maps
# onto the dual-tower variants' RGB tower; identical ResNet50 structure
_ALIASES = {"rgb_backbone": "backbone"}


def graft_towers(
    target: Dict[str, Dict], donor: Dict[str, Dict]
) -> Tuple[Dict[str, Dict], List[str]]:
    """Copy every tower scope present in both trees from donor into target.

    `target`/`donor` are {'params': ..., 'batch_stats': ...} variable dicts
    (as returned by `checkpoint.load_model_variables`). A target scope with
    no same-named donor scope falls back to its alias (donor 'backbone' →
    target 'rgb_backbone'). Returns (new_target, grafted) where `grafted`
    lists "<target_scope><-<donor_scope>" for the evidence log; scopes
    absent from the donor (e.g. a from-scratch depth tower) stay at the
    fresh init. Raises if nothing matches — a donor/variant mismatch.
    """
    new = {coll: dict(tree) for coll, tree in target.items()}
    grafted: List[str] = []
    for scope in _TOWER_SCOPES:
        if scope not in target.get("params", {}):
            continue
        src = scope if scope in donor.get("params", {}) else _ALIASES.get(scope)
        if src is None or src not in donor.get("params", {}):
            continue
        # a ResNet tower's params and BN running stats travel together; a
        # donor supplying one without the other would silently pair trained
        # convs with fresh (or stale) BN statistics — refuse that graft
        want = [c for c in ("params", "batch_stats")
                if scope in target.get(c, {})]
        have = [c for c in want if src in donor.get(c, {})]
        if have != want:
            raise ValueError(
                f"graft_towers: donor scope '{src}' covers collections "
                f"{have} but target scope '{scope}' needs {want}; grafting "
                "params without matching batch_stats (or vice versa) would "
                "skew any eval of the grafted model"
            )
        for coll in want:
            new[coll][scope] = donor[coll][src]
        grafted.append(f"{scope}<-{src}[{'+'.join(want)}]")
    if not grafted:
        raise ValueError(
            "graft_towers: no tower scope of the target matches the donor "
            f"(target scopes {list(target.get('params', {}))}, donor scopes "
            f"{list(donor.get('params', {}))})"
        )
    return new, grafted
