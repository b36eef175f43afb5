from .synthetic import SyntheticDataset, make_synthetic_images
