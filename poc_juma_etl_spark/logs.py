"""O9 — per-service file logger (reference utils.py:42-71).

The reference configures one ``logging`` logger per service, writing to
``logs/etl_<SERVICE>.log`` with a fixed format and idempotent handler setup
(calling again returns the same logger without stacking handlers). Same
contract here, with the log directory injectable — the engine must not write
outside caller-chosen paths. Driver-side only by design: per-table
orchestration events are driver-scale (one line per load), never per-row.
"""

from __future__ import annotations

import logging
from pathlib import Path

LOG_LEVEL = logging.INFO
LOG_FORMAT = "%(asctime)s - %(levelname)s - %(name)s - %(message)s"


def setup_service_logger(service_name: str, log_dir: str | Path) -> logging.Logger:
    """Create or fetch the file logger for one service. Idempotent: repeat
    calls return the configured logger without adding a second handler."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(f"ETL_{service_name}")
    logger.setLevel(LOG_LEVEL)
    logger.propagate = False  # file only; the CLI owns the terminal
    log_file = log_dir / f"etl_{service_name}.log"
    if not any(
        isinstance(h, logging.FileHandler) and h.baseFilename == str(log_file)
        for h in logger.handlers
    ):
        handler = logging.FileHandler(log_file, mode="a", encoding="utf-8")
        handler.setFormatter(logging.Formatter(LOG_FORMAT))
        logger.addHandler(handler)
        logger.info("Service log for '%s' -> %s", service_name, log_file)
    return logger
