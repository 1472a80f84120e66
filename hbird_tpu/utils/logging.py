"""Logger setup shared by all modules.

Same shape as the reference's logger-per-module pattern with an idempotent
default handler (reference hbird/hbird_eval.py:42-52) and the
HBIRD_LOG_LEVEL env override (reference hbird/models.py:27-29).
"""

from __future__ import annotations

import logging
import os


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers and not logging.getLogger().handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(
                fmt="%(asctime)s | %(levelname)s | %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        logger.addHandler(handler)
        level = os.environ.get("HBIRD_LOG_LEVEL", "INFO").upper()
        logger.setLevel(getattr(logging, level, logging.INFO))
    return logger
