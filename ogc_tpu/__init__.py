"""OGC-TPU: a TPU-native (JAX/XLA/Pallas) framework for unsupervised 3D object
segmentation from rigid dynamics of point clouds.

Re-designed from scratch for TPU hardware with the capabilities of the
reference OGC pipeline (vLAR-group/OGC): scene-flow estimation (FlowStep3D),
object segmentation (PointNet++ + MaskFormer), unsupervised geometric losses,
object-aware ICP refinement, and multi-frame co-segmentation voting.

Layout:
  ops/       point-cloud primitives (FPS, KNN, ball query, grouping,
             interpolation) as jittable XLA / Pallas kernels
  nn/        Flax building blocks (SharedMLP, SA/FP modules, MaskFormer head)
  models/    MaskFormer3D segnet and FlowStep3D flownet (config-parameterized)
  losses/    unsupervised OGC losses, flow losses, supervised mask loss
  metrics/   segmentation (AP/PQ/F1/mIoU/RI) and flow (EPE3D/Acc/Outlier)
  data/      dataset readers matching the reference .npz/.npy layouts
  refine/    object-aware ICP and multi-frame co-segmentation voting
  parallel/  jax.sharding mesh helpers for data-parallel training
  utils/     config, checkpointing, Hungarian assignment, ICP, GPF
"""

__version__ = "0.1.0"
