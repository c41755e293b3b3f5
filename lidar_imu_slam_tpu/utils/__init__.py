from . import trajectory
from . import metrics
from . import profiling

__all__ = ["trajectory", "metrics", "profiling"]
