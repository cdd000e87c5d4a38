"""Config layer: env-sourced dataset roots + YAML component registry."""

from .config import (
    FASTMRI_ROOT, OAI_ZIB_ROOT, KAGGLE_KNEE_PCK_ROOT, KNEE_MRI_ROOT,
    SKM_TEA_MAIN_ROOT, load_env,
)
from .registry import load_component, build_from_yaml

__all__ = [
    "FASTMRI_ROOT", "OAI_ZIB_ROOT", "KAGGLE_KNEE_PCK_ROOT", "KNEE_MRI_ROOT",
    "SKM_TEA_MAIN_ROOT", "load_env", "load_component", "build_from_yaml",
]
