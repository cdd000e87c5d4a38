"""TPU-native MRI segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``bonhchi/mri_acl_imagesegmentation_adsp``: fastMRI k-space reconstruction
(centered iFFT, RSS coil combination, GRAPPA), classical-CV preprocessing
(percentile clip, Otsu body mask, morphology, resize, in-mask z-score),
HBM-resident data loading, 2-D/2.5-D/3-D U-Net training with on-device
augmentation and metrics, sliding-window volume inference, and
data-parallel scaling over a ``jax.sharding.Mesh``.

Layer map (mirrors reference SURVEY.md §1):
  ops/       pure-jnp + Pallas numeric kernels (fftc, imageops, maskops, edt)
  recon/     k-space -> image reconstruction paths (single/multi-coil, GRAPPA)
  data/      adapters (h5/pickle), preprocess pipeline, packer, HBM loader
  models/    Flax U-Net 2D (SMP-style resnet encoder), fastMRI U-Net, U-Net 3D
  train/     losses, metrics, jitted engine, trainer, loggers, schedules
  infer/     sliding-window volume inference
  metrics/   report metrics (dice/iou/hd95/assd) on device
  parallel/  mesh + sharding helpers, collective metric reduction
  configs/   env roots, args schema (superset of reference UNet2DArgs)
  cli/       launcher (preprocess | split | train | infer | eval)
"""

__version__ = "0.1.0"
