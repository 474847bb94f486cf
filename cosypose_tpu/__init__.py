"""cosypose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 6D object pose estimation
framework with the capabilities of ylabbe/cosypose (ECCV'20, BOP Challenge 2020 winner).

Subpackages
-----------
ops        batched 3D math (SE(3), rotations, projection, crops, losses, symmetric
           distances, mesh database) and the Pallas rasterizer — the TPU-native
           equivalent of the reference's ``cosypose/lib3d`` + pybullet rendering.
models     flax modules: EfficientNet backbone family, pose predictor (render &
           compare with a ``lax.scan`` refinement loop), detector.
parallel   device-mesh / sharding helpers (DP training, sharded inference).
training   loss closures, optimizer schedules, the pjit train step, checkpointing.
data       BOP-format dataset ingestion and augmentations.
multiview  candidate RANSAC matching + object-level bundle adjustment.
evaluation meters (ADD/ADD-S AUC, detection mAP) and BOP CSV export.
utils      host-side tensor-collection interchange type, logging, timers.
"""

__version__ = "0.1.0"
