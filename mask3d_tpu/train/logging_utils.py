"""Metric logging: CSV + TensorBoard (the reference's `offline` profile).

Reference: loggers instantiated from `conf/logging/offline.yaml`
(TensorBoard + CSV), flattened hyperparams via `utils/utils.py:16-27`,
per-step `log_dict(on_epoch=True)` with Lightning epoch aggregation
(`mask3d/trainer/trainer.py:298-302`). Here `MetricLogger` aggregates
per-epoch means itself and writes both sinks.
"""

from __future__ import annotations

import csv
import logging
import os
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


class MetricLogger:
    def __init__(self, directory: str, use_tensorboard: bool = True,
                 hyperparams: Optional[dict] = None,
                 write_files: bool = True):
        """`write_files=False` (non-main processes of a multi-host run)
        keeps the in-memory aggregation — log_epoch still returns the
        epoch means every host needs — but writes no CSV/TensorBoard."""
        self.directory = directory
        self.write_files = write_files
        if write_files:
            os.makedirs(directory, exist_ok=True)
        use_tensorboard = use_tensorboard and write_files
        self.csv_path = os.path.join(directory, "metrics.csv")
        self._csv_fields = ["epoch", "step"]
        self._csv_rows = []
        # The CSV is rewritten whole each epoch (fieldnames can grow), so a
        # resumed process must seed from the existing file or the prior
        # history is lost on its first flush (the reference's CSVLogger
        # keeps history across resumes via version dirs, mask3d/README.md:19).
        if write_files and os.path.exists(self.csv_path):
            try:
                with open(self.csv_path, newline="") as f:
                    r = csv.DictReader(f)
                    for name in r.fieldnames or []:
                        if name not in self._csv_fields:
                            self._csv_fields.append(name)
                    self._csv_rows = [
                        {k: v for k, v in row.items() if v not in ("", None)}
                        for row in r
                    ]
            except Exception as e:
                logger.warning(f"could not seed metrics.csv history: {e}")
        self._epoch_acc: Dict[str, list] = defaultdict(list)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=directory)
                if hyperparams:
                    self._tb.add_text(
                        "hyperparams",
                        "\n".join(f"{k}: {v}" for k, v in hyperparams.items()),
                    )
            except Exception as e:  # tensorboard optional
                logger.warning(f"tensorboard unavailable: {e}")

    def log_step(self, metrics: Dict[str, float], step: int):
        """Accumulate for the epoch mean; also write per-step to TB."""
        for k, v in metrics.items():
            v = float(v)
            self._epoch_acc[k].append(v)
            if self._tb is not None:
                self._tb.add_scalar(f"{k}_step", v, step)

    def log_epoch(self, epoch: int, step: int,
                  extra: Optional[Dict[str, float]] = None) -> Dict[str, float]:
        """Flush epoch means (Lightning's on_epoch aggregation equivalent)."""
        means = {
            k: float(np.mean(vs)) for k, vs in self._epoch_acc.items()
        }
        if extra:
            means.update({k: float(v) for k, v in extra.items()})
        self._epoch_acc.clear()
        row = {"epoch": epoch, "step": step, **means}
        for k in means:
            if k not in self._csv_fields:
                self._csv_fields.append(k)
        # Dedup by epoch, keeping the latest row: with
        # save_last_every_n_epochs>1 a crash-resume replays up to N-1
        # epochs whose rows were already seeded from the existing file —
        # the replayed row supersedes the stale one (same epoch, earlier
        # history truncated by the checkpoint).
        self._csv_rows = [
            r for r in self._csv_rows if int(r.get("epoch", -1)) != epoch
        ]
        self._csv_rows.append(row)
        self._write_csv()
        if self._tb is not None:
            for k, v in means.items():
                self._tb.add_scalar(k, v, epoch)
            self._tb.flush()
        return means

    def _write_csv(self):
        if not self.write_files:
            return
        with open(self.csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields)
            w.writeheader()
            # Seeded history + replayed epochs stay chronologically ordered
            # whatever order the dedup left them in.
            for row in sorted(self._csv_rows,
                              key=lambda r: int(r.get("epoch", -1))):
                w.writerow(row)

    def close(self):
        if self._tb is not None:
            self._tb.close()
