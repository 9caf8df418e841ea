"""Loggers: Acme-style write/close interface.

Rework of fab/utils/logging.py:12-103: ``Logger`` ABC with a dict-of-lists in-memory
sink (periodically pickled), a CSV sink (pandas-free incremental writer), and an
optional wandb sink (gated — wandb is not installed in this image).
"""
from __future__ import annotations

import csv
import os
import pickle
from typing import Any, Dict, List, Mapping, Optional

LoggingData = Mapping[str, Any]


class Logger:
    def write(self, data: LoggingData) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class ListLogger(Logger):
    """Dict-of-lists history, periodically pickled (fab/utils/logging.py:26-68)."""

    def __init__(self, save: bool = False, save_path: str = "/tmp/logging_hist.pkl",
                 save_period: int = 100):
        self.save = save
        self.save_path = save_path
        self.save_period = save_period
        self.history: Dict[str, List[Any]] = {}
        self.iter = 0
        if save:
            os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)

    def write(self, data: LoggingData) -> None:
        for key, value in data.items():
            value = float(value) if hasattr(value, "__float__") else value
            self.history.setdefault(key, []).append(value)
        self.iter += 1
        if self.save and self.iter % self.save_period == 0:
            with open(self.save_path, "wb") as f:
                pickle.dump(self.history, f)

    def close(self) -> None:
        if self.save:
            with open(self.save_path, "wb") as f:
                pickle.dump(self.history, f)


class CSVLogger(Logger):
    """Incremental CSV writer (analogue of PandasLogger, fab/utils/logging.py:84-103).

    Rows may have varying key sets; the header is the union seen so far and the file
    is rewritten when new columns appear.
    """

    def __init__(self, save_path: str = "logging_hist.csv", save_period: int = 100):
        self.save_path = save_path
        self.save_period = save_period
        self.rows: List[Dict[str, Any]] = []
        self.columns: List[str] = []
        self._unflushed = 0
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)

    def write(self, data: LoggingData) -> None:
        row = {
            k: (float(v) if hasattr(v, "__float__") else v) for k, v in data.items()
        }
        for k in row:
            if k not in self.columns:
                self.columns.append(k)
        self.rows.append(row)
        self._unflushed += 1
        if self._unflushed >= self.save_period:
            self._flush()

    def resume_from(self, max_step: int) -> None:
        """Reload the existing CSV, truncating rows past ``max_step`` (the
        reference's resume-time CSV truncation, experiments/aldp/train.py:163-195).
        Rows without a 'step' column are kept."""
        if not os.path.exists(self.save_path):
            return
        with open(self.save_path) as f:
            rows = list(csv.DictReader(f))
        self.rows = [
            r for r in rows
            if not r.get("step") or float(r["step"]) <= max_step
        ]
        for r in self.rows:
            for k in r:
                if k not in self.columns:
                    self.columns.append(k)
        self._flush()

    def _flush(self) -> None:
        with open(self.save_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.columns, restval="")
            writer.writeheader()
            writer.writerows(self.rows)
        self._unflushed = 0

    def close(self) -> None:
        self._flush()


class WandbLogger(Logger):  # pragma: no cover — wandb not in this image
    """W&B sink (fab/utils/logging.py:71-81); requires `wandb` to be installed."""

    def __init__(self, **init_kwargs):
        import wandb

        self.run = wandb.init(**init_kwargs)
        self.iter = 0

    def write(self, data: LoggingData) -> None:
        self.run.log(data, step=self.iter)
        self.iter += 1

    def close(self) -> None:
        self.run.finish()


class ChainLogger(Logger):
    """Fan out to several loggers."""

    def __init__(self, loggers: List[Logger]):
        self.loggers = loggers

    def write(self, data: LoggingData) -> None:
        for logger in self.loggers:
            logger.write(data)

    def close(self) -> None:
        for logger in self.loggers:
            logger.close()
