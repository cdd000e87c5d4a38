"""Reconstruction paths: cartesian single/multi-coil, GRAPPA, T2, DWI."""

from .cartesian import (
    recon_singlecoil, recon_multicoil_rss, ifftnd_scaled, center_crop_im,
    flip_im,
)
from .grappa import Grappa
from .t2 import t2_reconstruction, create_coil_combined_im
from .dwi import (
    dwi_reconstruction, trapezoidal_regridding, compute_averages,
    trace, adc, b1500, compute_trace_adc_b1500,
)
from .varnet import (
    VarNet, VarNetBlock, SensitivityModel, NormUnet, sens_reduce, sens_expand,
)

__all__ = [
    "recon_singlecoil", "recon_multicoil_rss", "ifftnd_scaled",
    "center_crop_im", "flip_im", "Grappa",
    "t2_reconstruction", "create_coil_combined_im",
    "dwi_reconstruction", "trapezoidal_regridding", "compute_averages",
    "trace", "adc", "b1500", "compute_trace_adc_b1500",
    "VarNet", "VarNetBlock", "SensitivityModel", "NormUnet",
    "sens_reduce", "sens_expand",
]
