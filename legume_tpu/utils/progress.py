"""Progress registry (matrix-util progress traits equivalent,
SURVEY.md section 2.1).

A process-wide registry of named stages; each stage tracks done/total,
rate, and ETA. Rendering is stderr-line based (no TTY control codes —
safe under drivers and log capture) and throttled. Disabled entirely
unless `LEGUME_PROGRESS=1` (library callers stay silent by default;
the CLI enables it).
"""

from __future__ import annotations

import os
import sys
import threading
import time

__all__ = ["progress", "ProgressStage"]

_ENABLED = os.environ.get("LEGUME_PROGRESS") == "1"
_MIN_INTERVAL = 2.0  # seconds between renders per stage


class ProgressStage:
    def __init__(self, registry, name: str, total: int | None):
        self._reg = registry
        self.name = name
        self.total = total
        self.done = 0
        self.t0 = time.time()
        self._last_render = 0.0

    def update(self, n: int = 1):
        self.done += n
        now = time.time()
        if _ENABLED and now - self._last_render >= _MIN_INTERVAL:
            self._last_render = now
            self._render(now)

    def _render(self, now):
        el = now - self.t0
        rate = self.done / max(el, 1e-9)
        if self.total:
            eta = (self.total - self.done) / max(rate, 1e-9)
            msg = (
                f"[{self.name}] {self.done}/{self.total} "
                f"({100 * self.done / self.total:.0f}%) "
                f"{rate:.1f}/s eta {eta:.0f}s"
            )
        else:
            msg = f"[{self.name}] {self.done} done, {rate:.1f}/s"
        print(msg, file=sys.stderr, flush=True)

    def finish(self):
        if _ENABLED:
            el = time.time() - self.t0
            print(
                f"[{self.name}] finished {self.done} in {el:.1f}s",
                file=sys.stderr, flush=True,
            )
        self._reg._drop(self.name)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()


class _Registry:
    def __init__(self):
        self._stages: dict[str, ProgressStage] = {}
        self._lock = threading.Lock()

    def stage(self, name: str, total: int | None = None) -> ProgressStage:
        with self._lock:
            st = ProgressStage(self, name, total)
            self._stages[name] = st
            return st

    def _drop(self, name: str):
        with self._lock:
            self._stages.pop(name, None)

    def active(self) -> list[str]:
        with self._lock:
            return list(self._stages)


progress = _Registry()
