from . import streams
from . import mesh

__all__ = ["streams", "mesh"]
