"""pose6d_tpu — TPU-native 6D object pose estimation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
SFR-Vision/6d-pose-estimation repo (two-stage YOLOv8 detect -> pose-regression
pipeline on LineMOD, four pose-net variants, ADD/ADD-S evaluation), built
TPU-first: functional models (Flax linen), jitted train/eval steps, sharded
data parallelism over a `jax.sharding.Mesh`, on-device fused preprocessing,
and batched vectorized evaluation.

Package layout:
  geometry/  pure-jnp quaternion / pinhole-camera math ([x,y,z,w] convention)
  data/      LineMOD index + host decode + device-side preprocessing
  models/    ResNet50 backbone, unified PoseNet (4 variants), YOLOv8 (flax)
  ops/       Pallas TPU kernels + device-side image ops (crop/resize/augment)
  losses/    training loss (geodesic+L1) and ADD/ADD-S/ADD-0.1d evaluation
  train/     jitted train loop, plateau schedule, orbax checkpointing
  parallel/  mesh construction and sharding rules (dp + tp)
  infer/     unified detect->crop->pose inference pipeline
  configs/   per-variant presets mirroring the reference recipes
  utils/     host-side camera/mesh/visualization helpers
"""

__version__ = "0.1.0"

# CPU-forcing escape hatch for subprocess CLIs (CI, the reproduce_reference
# dry-run test): the axon sitecustomize pins platform selection so the
# JAX_PLATFORMS env var alone cannot reach CPU; an explicit config update
# before first backend touch can. In-process tests use conftest.py instead.
if __import__("os").environ.get("POSE6D_FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
