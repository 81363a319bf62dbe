from .config import FrameworkConfig, load_config
from .logger import get_logger

__all__ = ["FrameworkConfig", "load_config", "get_logger"]
