from .checkpoint import CheckpointManager, load_weights_only
from .images import make_grid, save_image
from .logging import ExperimentLogger
