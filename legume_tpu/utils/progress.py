"""Progress registry (matrix-util `progress.rs:23` MULTI_PROGRESS +
indicatif-log-bridge equivalents, SURVEY.md sections 2.1/5).

A process-wide registry of named stages; each stage tracks done/total,
rate, and ETA. Two renderers:

- TTY: a live MULTI-BAR block — every active stage draws one bar line,
  redrawn in place with ANSI cursor moves; `progress.println` (and the
  installed logging bridge) clears the block, prints the message, and
  redraws, so logs interleave above the bars exactly like
  indicatif-log-bridge.
- non-TTY (drivers, log capture): throttled plain stderr lines.

Disabled entirely unless `LEGUME_PROGRESS=1` (library callers stay
silent by default; the CLI enables it).
"""

from __future__ import annotations

import logging
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
        if not _ENABLED:
            return
        if self._reg._tty:
            self._reg._maybe_redraw(now)
        elif now - self._last_render >= _MIN_INTERVAL:
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

    def bar_line(self, now, width: int = 34) -> str:
        el = now - self.t0
        rate = self.done / max(el, 1e-9)
        if self.total:
            frac = min(self.done / max(self.total, 1), 1.0)
            filled = int(frac * width)
            bar = "#" * filled + "-" * (width - filled)
            eta = (self.total - self.done) / max(rate, 1e-9)
            return (
                f"[{self.name:<18.18}] |{bar}| "
                f"{self.done}/{self.total} {rate:.1f}/s eta {eta:.0f}s"
            )
        return f"[{self.name:<18.18}] {self.done} done, {rate:.1f}/s"

    def finish(self):
        if _ENABLED:
            el = time.time() - self.t0
            self._reg.println(
                f"[{self.name}] finished {self.done} in {el:.1f}s"
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
        self._tty = _ENABLED and sys.stderr.isatty()
        self._drawn_lines = 0
        self._last_draw = 0.0

    def stage(self, name: str, total: int | None = None) -> ProgressStage:
        with self._lock:
            st = ProgressStage(self, name, total)
            self._stages[name] = st
            return st

    def _drop(self, name: str):
        with self._lock:
            self._stages.pop(name, None)
        if self._tty:
            self._redraw()

    def active(self) -> list[str]:
        with self._lock:
            return list(self._stages)

    # ---- multi-bar rendering (TTY only) -------------------------------

    def _clear_block(self):
        if self._drawn_lines:
            sys.stderr.write(f"\x1b[{self._drawn_lines}F\x1b[J")
            self._drawn_lines = 0

    def _redraw(self):
        now = time.time()
        with self._lock:
            stages = list(self._stages.values())
        self._clear_block()
        for st in stages:
            sys.stderr.write(st.bar_line(now) + "\n")
        self._drawn_lines = len(stages)
        sys.stderr.flush()
        self._last_draw = now

    def _maybe_redraw(self, now):
        if now - self._last_draw >= 0.25:
            self._redraw()

    def println(self, msg: str):
        """Print a message that interleaves cleanly with the live bars
        (indicatif-log-bridge role)."""
        if self._tty:
            self._clear_block()
            print(msg, file=sys.stderr, flush=True)
            self._redraw()
        else:
            print(msg, file=sys.stderr, flush=True)


class _BridgeHandler(logging.Handler):
    """Route log records through the registry so messages print above
    the live bars (logging.rs indicatif-log-bridge role)."""

    def emit(self, record):
        try:
            progress.println(self.format(record))
        except Exception:
            pass


def install_log_bridge(level=None):
    """Replace root stderr handlers with the bar-aware bridge; no-op
    without LEGUME_PROGRESS or without a TTY."""
    if not _ENABLED or not progress._tty:
        return
    root = logging.getLogger()
    for h in list(root.handlers):
        if isinstance(h, logging.StreamHandler) and not isinstance(h, _BridgeHandler):
            root.removeHandler(h)
    bh = _BridgeHandler()
    bh.setFormatter(logging.Formatter("[%(levelname)s %(name)s] %(message)s"))
    root.addHandler(bh)
    if level is not None:
        root.setLevel(level)


progress = _Registry()
