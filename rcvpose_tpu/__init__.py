"""rcvpose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) RGB-D 6DoF pose framework.

A ground-up rebuild of the capabilities of RCVPose ("Vote from the Center:
6 DoF Pose Estimation in RGB-D Images by Radial Keypoint Voting", ECCV 2022;
reference implementation surveyed in /root/repo/SURVEY.md):

  * ``rcvpose_tpu.geometry``  — pinhole projection / back-projection, pure jnp
  * ``rcvpose_tpu.labels``    — jit-fused radial + semantic GT label generation
  * ``rcvpose_tpu.models``    — DenseFCNResNet152 / ResFCNResNet152 in Flax (NHWC)
  * ``rcvpose_tpu.ops``       — the 3D radial-voting accumulator: dense jnp
                                oracle + Pallas TPU kernel
  * ``rcvpose_tpu.fit``       — Horn closed-form pose fit (eigh) + jnp ICP
  * ``rcvpose_tpu.metrics``   — ADD / ADD-S / AUC
  * ``rcvpose_tpu.data``      — LINEMOD / Occlusion-LINEMOD / YCB-Video IO,
                                batching, prefetch
  * ``rcvpose_tpu.train``     — pjit data-parallel training loop
  * ``rcvpose_tpu.eval``      — end-to-end pose evaluation pipelines
  * ``rcvpose_tpu.parallel``  — device-mesh helpers, sharded voting
"""

__version__ = "0.1.0"

from rcvpose_tpu import geometry  # noqa: F401
