"""Telemetry sinks: CSV/JSON result logs and step timing.

First-class replacements for the reference's ad-hoc observability (SURVEY.md
§5.1/§5.5): per-evaluator CSV appenders (reference evaluators.py:374-387), the
cumulative ``_quadruplet_loss_eval.json`` log (evaluators.py:106-125), and
tqdm-as-telemetry — plus ``jax.profiler`` trace annotations the reference
never had.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from contextlib import contextmanager
from typing import Any, Dict, List, Optional, Sequence

import jax

logger = logging.getLogger("qst_tpu")


class CsvSink:
    """Append-only CSV results file with a fixed header (written once)."""

    def __init__(self, path: str, header: Sequence[str]):
        self.path = path
        self.header = list(header)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if not os.path.isfile(path):
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(self.header)

    def append(self, row: Sequence[Any]) -> None:
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(list(row))


class JsonLogSink:
    """Cumulative JSON-array log (load, append, rewrite) — same on-disk shape
    as the reference's ``_quadruplet_loss_eval.json`` (evaluators.py:106-125).
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def append(self, entry: Dict[str, Any]) -> None:
        entries: List[Dict[str, Any]] = []
        if os.path.isfile(self.path):
            try:
                with open(self.path) as f:
                    entries = json.load(f)
            except (json.JSONDecodeError, OSError):
                entries = []
        entries.append(entry)
        with open(self.path, "w") as f:
            json.dump(entries, f, indent=2)

    def read(self) -> List[Dict[str, Any]]:
        if not os.path.isfile(self.path):
            return []
        with open(self.path) as f:
            return json.load(f)


class StepTimer:
    """Wall-clock phase timing with running means; device-synchronized."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def phase(self, name: str, sync: Any = None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return self.totals.get(name, 0.0) / c if c else 0.0

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.totals}


@contextmanager
def profile_trace(log_dir: Optional[str]):
    """Optionally capture a jax.profiler trace around a block."""
    if log_dir:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
