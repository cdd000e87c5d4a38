"""Data stack: raw adapters, preprocess pipeline, artifact packer, loaders."""

from .adapters import BaseAdapter, FastMRISinglecoilAdapter, KneePckAdapter
from .preprocess import MRIKneePreprocessor, preprocess_record, preprocess_records
from .trainer_dataset import TrainerDataset

__all__ = [
    "BaseAdapter", "FastMRISinglecoilAdapter", "KneePckAdapter",
    "MRIKneePreprocessor", "preprocess_record", "preprocess_records",
    "TrainerDataset",
]
