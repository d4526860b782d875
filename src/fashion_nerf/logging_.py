"""Structured step logging (SURVEY.md §5.5).

Stdout lines always; tensorboardX scalars when the package is importable
(gated — it is optional in this environment). The BASELINE.json:2 north-star
metric (rays/sec) is a first-class logged scalar from step one.
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, cfg=None, log_dir: str | None = None):
        # perf_counter, not time.time(): wall clock can step (NTP) mid-run
        self.t0 = time.perf_counter()
        self._tb = None
        if log_dir:
            try:
                from tensorboardX import SummaryWriter  # type: ignore
                os.makedirs(log_dir, exist_ok=True)
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        if cfg is not None:
            header = {"config": cfg.name, "t": 0.0}
            print(f"[fashion-nerf] {json.dumps(header)}", flush=True)

    def __call__(self, entry: dict):
        entry = dict(entry)
        entry["t"] = round(time.perf_counter() - self.t0, 2)
        print(f"[fashion-nerf] {json.dumps(entry)}", flush=True)
        if self._tb is not None and "step" in entry:
            step = int(entry["step"])
            for k, v in entry.items():
                if isinstance(v, (int, float)) and k not in ("step", "t"):
                    self._tb.add_scalar(k, v, step)

    def image(self, tag: str, img, step: int):
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")
