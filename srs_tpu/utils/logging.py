"""Logging configuration.

Parity role of the reference's per-module ``logging.basicConfig`` calls
(reference: main.py:24-31 logs to stdout + super_resolution.log;
tiling_module.py:36, super_resolution_module.py:37-41, blending:33-35,
agent_scheduler:34-38): one setup function configuring the ``srs_tpu``
logger tree with optional file output.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def setup_logging(
    level: int = logging.INFO,
    log_file: Optional[str] = "super_resolution.log",
    stream: bool = True,
) -> logging.Logger:
    """Configure the framework logger tree. Returns the root srs_tpu logger."""
    logger = logging.getLogger("srs_tpu")
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(_FORMAT)
    if stream:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(fmt)
        logger.addHandler(h)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
