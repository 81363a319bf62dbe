from .flat import FlatIndex
from .ivf import IVFIndex
from .base import PartitionIndex

__all__ = ["FlatIndex", "IVFIndex", "PartitionIndex"]
