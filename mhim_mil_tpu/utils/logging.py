"""Experiment logging: JSONL metrics stream + optional wandb.

The reference logs per-iteration meters and per-epoch metric rows to stdout
and (opt-in) wandb (reference: main.py:456-468, engines/base_engine.py:179-218).
Here the always-on sink is a JSONL file under the run's output dir — greppable,
diffable, no services — and wandb attaches on top when installed and enabled.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class RunLogger:
    def __init__(self, output_path: Optional[str], project: str = "mil_tpu",
                 title: str = "default", use_wandb: bool = False, config: Optional[Dict] = None):
        self.path = None
        self._f = None
        if output_path:
            os.makedirs(output_path, exist_ok=True)
            self.path = os.path.join(output_path, f"{title}_log.jsonl")
            self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=title, config=config or {})
            except Exception as e:  # wandb missing or offline — degrade quietly
                print(f"[logger] wandb unavailable ({e}); JSONL only")

    def log(self, row: Dict, step: Optional[int] = None) -> None:
        rec = {"ts": time.time(), **({"step": step} if step is not None else {}), **row}
        if self._f:
            self._f.write(json.dumps(rec, default=float) + "\n")
            self._f.flush()
        if self._wandb is not None:
            self._wandb.log(row, step=step)

    def close(self) -> None:
        if self._f:
            self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
