from .checkpoint import CheckpointManager, filter_frozen  # noqa: F401
from .metrics import MetricsAggregator, log_stats  # noqa: F401
from .pt_loader import flatten_state_dict, load_pt  # noqa: F401
from .trainer import Trainer, TrainState, build_optimizer, trainable_mask  # noqa: F401
