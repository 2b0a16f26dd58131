"""Run logging: timestamped file logger + scalar metrics writer.

Equivalent of the reference's python-logging + tensorboardX setup
(reference utils/other_utils.py:8-24, train_egohmr.py:166-172,244). Scalars
go to a JSONL file (universally parseable) and, when tensorboardX is
importable, to TensorBoard as well.
"""
from __future__ import annotations

import datetime
import json
import logging
import os
from typing import Dict, Optional


def get_logger(logdir: str, name: str = "egohmr_tpu") -> logging.Logger:
    os.makedirs(logdir, exist_ok=True)
    logger = logging.getLogger(name)
    ts = datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    handler = logging.FileHandler(os.path.join(logdir, f"run_{ts}.log"))
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(handler)
    logger.addHandler(logging.StreamHandler())
    logger.setLevel(logging.INFO)
    return logger


def save_config(logdir: str, config: Dict) -> None:
    os.makedirs(logdir, exist_ok=True)
    with open(os.path.join(logdir, "params.json"), "w") as f:
        json.dump(config, f, indent=4, sort_keys=True, default=str)


class MetricsWriter:
    """Scalars to JSONL (+ TensorBoard when available)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
