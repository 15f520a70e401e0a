"""Logging + experiment tracking (BasicSR `get_root_logger` / tb_logger
surface — reference consumes these from basicsr.utils, SURVEY.md §2.8)."""

from __future__ import annotations

import logging
import sys
from typing import Optional

_LOGGER_NAME = "pgtformer_tpu"


def get_root_logger(log_file: Optional[str] = None,
                    level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class TBLogger:
    """Thin TensorBoard wrapper (no-op if unavailable)."""

    def __init__(self, log_dir: Optional[str]):
        self.writer = None
        if log_dir:
            try:
                from flax.metrics import tensorboard
                self.writer = tensorboard.SummaryWriter(log_dir)
            except Exception:
                pass

    def scalars(self, step: int, metrics: dict):
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass

    def flush(self):
        if self.writer is not None:
            self.writer.flush()
