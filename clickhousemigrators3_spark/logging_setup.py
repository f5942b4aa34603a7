"""Logging — parity with reference ``utils/logging.py:5-26`` (loguru
console + timestamped file sinks), stdlib-based (loguru isn't a dependency
here) and with quirk Q8 fixed: the ``log_level`` parameter is actually
honored (the reference accepts it and then hardcodes levels).
"""

from __future__ import annotations

import logging
import os
import time


def setup_logger(
    log_dir: str = "./logs", log_level: str = "INFO", name: str = "spark_migrator"
) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:  # idempotent re-setup
        return logger
    level = getattr(logging, log_level.upper(), logging.INFO)
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)-7s | %(name)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    console.setLevel(level)
    logger.addHandler(console)

    os.makedirs(log_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    file_handler = logging.FileHandler(os.path.join(log_dir, f"migration_{stamp}.log"))
    file_handler.setFormatter(fmt)
    file_handler.setLevel(level)
    logger.addHandler(file_handler)
    return logger
