"""Per-run log-file sink: the reference's setup_logging analog.

The reference configures a timestamped file + stream handler pair
before its pipeline runs (setup_vector_search.py:218-232: log dir
created, ``vector_store_setup_<ts>.log``, INFO level, asctime/level/
name/message format). This is the engine's equivalent seam -- driver-
side run logs, one file per run, same format. Executor-side logging
stays with Spark's own log4j; this sink is for the orchestration layer
(ingest jobs, index builds, merges) the reference logged.
"""

from __future__ import annotations

import logging
import os
from datetime import datetime

LOG_FORMAT = "%(asctime)s - %(levelname)s - %(name)s - %(message)s"


def setup_run_logging(
    log_dir: str = "app/log",
    prefix: str = "engine_run",
    level: int = logging.INFO,
    stream: bool = True,
) -> str:
    """Create ``log_dir`` and attach a fresh timestamped file handler
    (plus optional stream handler) to the root logger. Returns the log
    file path. Mirrors the reference's handler pair and format."""
    os.makedirs(log_dir, exist_ok=True)
    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_filename = os.path.join(log_dir, f"{prefix}_{timestamp}.log")

    handlers: list[logging.Handler] = [
        logging.FileHandler(log_filename, mode="w", encoding="utf-8")
    ]
    if stream:
        handlers.append(logging.StreamHandler())
    formatter = logging.Formatter(LOG_FORMAT)
    root = logging.getLogger()
    root.setLevel(level)
    for h in handlers:
        h.setFormatter(formatter)
        root.addHandler(h)
    return log_filename
