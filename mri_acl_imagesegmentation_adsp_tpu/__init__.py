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

import os as _os


def _sync_platform_from_env() -> None:
    """Make the ``JAX_PLATFORMS`` env var effective despite pre-imported jax.

    On this image a sitecustomize hook imports jax and registers the TPU
    plugin before any user code runs, so by the time a subprocess (CLI tool,
    test) starts, jax has already snapshotted its platform config and the
    ``JAX_PLATFORMS`` environment variable no longer selects the backend.
    A child launched with ``JAX_PLATFORMS=cpu`` would silently land on the
    TPU relay — and hang if the relay is down. Mirror the env var into the
    live config at package import so the documented control works; a no-op
    when jax already initialized a backend (then it's too late by design).
    """
    plats = _os.environ.get("JAX_PLATFORMS")
    if plats:
        try:
            import jax

            if getattr(jax.config, "jax_platforms", None) != plats:
                jax.config.update("jax_platforms", plats)
        except Exception:
            pass  # never let platform plumbing break an import


_sync_platform_from_env()
