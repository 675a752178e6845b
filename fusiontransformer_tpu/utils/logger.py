"""Run logger with per-run file handler (reference ``common/utils/logger.py:8-27``)."""

from __future__ import annotations

import logging
import os
import sys
import time


def setup_logger(name, save_dir, comment=""):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    # Avoid duplicated handlers when called twice.
    for h in list(logger.handlers):
        logger.removeHandler(h)

    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    ch.setFormatter(fmt)
    logger.addHandler(ch)

    if save_dir:
        timestamp = time.strftime("%m-%d_%H-%M-%S")
        comment = "." + comment if comment else ""
        log_file = os.path.join(save_dir, f"log{comment}.{timestamp}.txt")
        fh = logging.FileHandler(log_file)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    return logger
