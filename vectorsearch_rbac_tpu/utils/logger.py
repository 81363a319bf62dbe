"""Shared colorized logger (replaces reference services/logger.py:50)."""

from __future__ import annotations

import logging
import os
import sys

_COLORS = {
    logging.DEBUG: "\033[36m",     # cyan
    logging.INFO: "\033[32m",      # green
    logging.WARNING: "\033[33m",   # yellow
    logging.ERROR: "\033[31m",     # red
    logging.CRITICAL: "\033[35m",  # magenta
}
_RESET = "\033[0m"


class _ColorFormatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__("%(asctime)s %(levelname)s %(name)s: %(message)s", "%H:%M:%S")
        self._use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if self._use_color:
            color = _COLORS.get(record.levelno, "")
            return f"{color}{msg}{_RESET}"
        return msg


_configured = False


def get_logger(name: str = "vsrbac") -> logging.Logger:
    """Return a logger with a single shared stderr handler."""
    global _configured
    root = logging.getLogger("vsrbac")
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter(use_color=sys.stderr.isatty()))
        root.addHandler(handler)
        root.setLevel(os.environ.get("VSRBAC_LOG_LEVEL", "INFO").upper())
        root.propagate = False
        _configured = True
    if name == "vsrbac" or name.startswith("vsrbac."):
        return logging.getLogger(name)
    return logging.getLogger(f"vsrbac.{name}")
