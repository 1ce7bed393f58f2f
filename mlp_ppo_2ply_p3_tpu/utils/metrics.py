"""Structured metrics pipeline: JSONL always, TensorBoard if available.

Replaces the reference's three ad-hoc channels (tensorboardX with an S3
monkey-patch, stdout prints, module loggers — SURVEY.md §5.5) with one
host-side writer fed scalar pytrees from jitted train steps."""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, jsonl_path: str | None = None, tb_logdir: str | None = None):
        self._jsonl = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._jsonl = open(jsonl_path, "a", buffering=1)
        self._tb = None
        if tb_logdir:
            # torch's writer first: tensorboardX is vulnerable to global
            # RecordWriter monkey-patching (the reference patches it for
            # S3 at import, ppo_agent.py:23-54 — loading the reference in
            # the same process silently breaks tensorboardX event files)
            try:  # tensorboard backends are optional in this image
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir=tb_logdir)
            except Exception:
                try:
                    from tensorboardX import SummaryWriter  # type: ignore

                    self._tb = SummaryWriter(log_dir=tb_logdir)
                except Exception:
                    self._tb = None

    def write(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb:
            for k, v in rec.items():
                if k in ("step", "time"):
                    continue
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
