"""Structured metrics logging.

The reference logs free text through RecBole and then *re-parses its
own logs with regexes* to recover per-epoch metrics for plotting
(reference ``plot_utils.py:7-12``, ``run.py:102-112``).  Here metrics
are emitted structured at the source — one JSON line per event — and
the plotting utilities consume those records directly; the human log
stream is a rendering, not the source of truth.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def init_logger(name: str = "recblr_tpu", log_file: str | None = None):
    logger = logging.getLogger(name)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S")
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.propagate = False
    if log_file:
        # one active per-run log file: detach any previous run's file
        # handler (multi-experiment drivers like full_exp/parity_exp call
        # init_logger once per run in the same process — without this,
        # run N's lines would duplicate into runs 1..N-1's files)
        for h in [h for h in logger.handlers if isinstance(h, logging.FileHandler)]:
            if getattr(h, "baseFilename", None) != os.path.abspath(log_file):
                logger.removeHandler(h)
                h.close()
        have = {
            getattr(h, "baseFilename", None)
            for h in logger.handlers
            if isinstance(h, logging.FileHandler)
        }
        if os.path.abspath(log_file) not in have:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class MetricsLogger:
    """JSONL event sink: {"event": ..., "epoch": ..., metrics...}."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.records: list[dict] = []
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # truncate any previous run's file
            open(path, "w").close()

    def log(self, event: str, **fields):
        rec = {"event": event, "time": time.time(), **fields}
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def epoch_records(self, event: str = "epoch"):
        return [r for r in self.records if r["event"] == event]


def load_metrics(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
