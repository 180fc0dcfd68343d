from .logging import MetricLogger, SmoothedValue
from .checkpoint import CheckpointManager

__all__ = ["MetricLogger", "SmoothedValue", "CheckpointManager"]
