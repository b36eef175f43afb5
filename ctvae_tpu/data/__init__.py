from .synthetic import SyntheticDataset, make_synthetic_images
from .transforms import StandardTransform, center_crop, resize, to_float
from .transition import (MODES, TransitionBatchScheduler, TransitionDataset)
from .datamodule import DATASETS, VAEDataset
