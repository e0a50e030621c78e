from istnet_tpu.data.dataset import TestDataset, TrainingDataset
from istnet_tpu.data.loader import DataLoader, collate

__all__ = ["DataLoader", "TestDataset", "TrainingDataset", "collate"]
