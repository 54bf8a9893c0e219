"""Structured per-stage metrics (SURVEY.md §5 "Metrics / observability", A5).

The reference emits nothing (no ink! events); its observable surface is the
error taxonomy.  BASELINE.md however requires "structured per-stage timing
(synthesis/commit/NTT/open), ops/s counters per kernel", so the TPU build
carries a lightweight collector:

* ``stage(name)`` — context manager timing one pipeline stage; optional
  ``ops``/``unit`` turn the record into an ops/s counter.
* ``record(name, seconds, ops=, unit=)`` — same, for pre-measured spans
  (used by the prover's ``_mark`` hooks).
* ``report()`` — the collected records as dicts; ``emit()`` prints them as
  JSON lines to ``ZKTPU_METRICS`` (a file path, or stderr when "1").

Collection is off unless enabled — ``enable()``, or the ``ZKTPU_METRICS`` /
``ZKTPU_TIMING`` environment variables — so the hot path pays one branch.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class Metrics:
    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.records: list[dict] = []

    def enable(self) -> None:
        self.enabled = True

    def clear(self) -> None:
        self.records = []

    def record(
        self,
        name: str,
        seconds: float,
        ops: float | None = None,
        unit: str | None = None,
    ) -> None:
        if not self.enabled:
            return
        rec: dict = {"stage": name, "seconds": round(seconds, 6)}
        if ops is not None:
            rec["ops"] = ops
            rec["ops_per_s"] = round(ops / seconds, 1) if seconds > 0 else None
            if unit:
                rec["unit"] = unit
        self.records.append(rec)

    @contextlib.contextmanager
    def stage(self, name: str, ops: float | None = None, unit: str | None = None):
        if not self.enabled:
            yield
            return
        t0 = time.time()
        try:
            yield
        finally:
            self.record(name, time.time() - t0, ops, unit)

    def report(self) -> list[dict]:
        return list(self.records)

    def emit(self, out=None) -> None:
        if not self.records:
            return
        dest = os.environ.get("ZKTPU_METRICS", "1")
        close = False
        if out is None:
            if dest not in ("", "1", "stderr"):
                out = open(dest, "a")
                close = True
            else:
                out = sys.stderr
        try:
            for rec in self.records:
                print(json.dumps(rec), file=out, flush=True)
        finally:
            if close:
                out.close()


METRICS = Metrics(
    enabled=os.environ.get("ZKTPU_METRICS") is not None
    or os.environ.get("ZKTPU_TIMING") == "1"
)


def stage(name: str, ops: float | None = None, unit: str | None = None):
    return METRICS.stage(name, ops, unit)


def record(name: str, seconds: float, ops: float | None = None, unit: str | None = None):
    METRICS.record(name, seconds, ops, unit)
