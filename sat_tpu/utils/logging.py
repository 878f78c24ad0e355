"""Metric logging behind a small interface.

The reference logs every batch to W&B and stdout (reference train.py:183-192,
301-308, 335-341). Here the same metric names flow through a `MetricLogger`
with pluggable backends: stdout is implicit in the train loop, JSONL writes
one object per `log()` call, and the W&B backend activates only when the
package is importable and explicitly enabled (it is not part of the baked-in
environment).
"""

from __future__ import annotations

import json
import time
from typing import Optional


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None, use_wandb: bool = False,
                 wandb_config: Optional[dict] = None):
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # optional dependency
                self._wandb = wandb
                self._wandb.init(project="show-attend-and-tell",
                                 config=wandb_config or {})
            except ImportError:
                print("wandb requested but not installed; continuing without it")

    def log(self, metrics: dict) -> None:
        payload = {k: _to_scalar(v) for k, v in metrics.items()}
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"time": time.time(), **payload}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(payload)

    def log_table(self, name: str, columns, rows) -> None:
        """Predictions-table analogue of wandb.Table (reference train.py:210,308)."""
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"time": time.time(), "table": name,
                                          "columns": list(columns),
                                          "rows": rows}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            table = self._wandb.Table(columns=list(columns))
            for r in rows:
                table.add_data(*r)
            self._wandb.log({name: table})

    def log_image(self, name: str, path: str, caption: str | None = None) -> None:
        """Image channel — the analogue of the reference's ≤50 test-split
        attention visualizations logged to W&B (reference train.py:317,
        431-433). The figure is rendered to `path` by the caller; this logs
        it through the metric backends: W&B gets a wandb.Image, JSONL
        records the file path + caption."""
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"time": time.time(), "image": name,
                                          "path": path,
                                          "caption": caption}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(path, caption=caption)})

    def save_file(self, path: str) -> None:
        if self._wandb is not None:
            self._wandb.save(path)

    def finish(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None
        if self._wandb is not None:
            self._wandb.finish()


def _to_scalar(v):
    try:
        import numpy as np
        if isinstance(v, np.generic):
            return v.item()
        if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
            return v.item()
    except Exception:
        pass
    return v
