"""O10 — live console dashboard for the parallel ETL run.

The reference renders a two-panel (RAW/GOLD) status board with ``rich.Live``
at 4 Hz while the process pool works (reference main.py:55-94, refresh
main.py:116). This engine reproduces the behavior dependency-free: a
thread-safe :class:`StatusBoard` holds per-table state, ``render`` draws the
two panels as plain text, and :class:`LivePainter` repaints the frame in
place with ANSI cursor movement at the same 4 Hz cadence. Non-TTY outputs
(CI logs, files) get one final frame instead of escape-code soup.

Pure driver-side presentation — no Spark constructs involved; the painter
thread only reads the board dict under its lock.
"""

from __future__ import annotations

import sys
import threading
import time

# table states, in display order
PENDING = "pending"
RUNNING = "running"
DONE = "done"
FAILED = "failed"

_GLYPH = {PENDING: "·", RUNNING: "▶", DONE: "✔", FAILED: "✘"}

REFRESH_HZ = 4.0  # reference main.py:116 refresh_per_second=4


class StatusBoard:
    """Thread-safe per-table status for the RAW and GOLD panels."""

    def __init__(self, raw_tables: list[str], gold_views: list[str]) -> None:
        self._lock = threading.Lock()
        self._t0 = time.monotonic()
        self._raw = {n: PENDING for n in raw_tables}
        self._gold = {v: PENDING for v in gold_views}
        self._elapsed: dict[str, float] = {}
        self._started: dict[str, float] = {}

    def mark(self, name: str, state: str) -> None:
        with self._lock:
            panel = self._raw if name in self._raw else self._gold
            panel[name] = state
            now = time.monotonic()
            if state == RUNNING:
                self._started[name] = now
            elif state in (DONE, FAILED):
                self._elapsed[name] = now - self._started.get(name, now)

    def finished(self) -> bool:
        with self._lock:
            return all(
                s in (DONE, FAILED)
                for s in list(self._raw.values()) + list(self._gold.values())
            )

    def snapshot(self) -> tuple[dict[str, str], dict[str, str], dict[str, float], float]:
        with self._lock:
            return (
                dict(self._raw),
                dict(self._gold),
                dict(self._elapsed),
                time.monotonic() - self._t0,
            )


def render(board: StatusBoard) -> str:
    """One text frame: RAW panel then GOLD panel, fixed-width, sorted for
    stable layout (reference sorts its status keys the same way,
    materialize_gold.py:88)."""
    raw, gold, elapsed, wall = board.snapshot()

    def panel(title: str, states: dict[str, str]) -> list[str]:
        lines = [f"── {title} " + "─" * max(0, 46 - len(title))]
        for name in sorted(states):
            s = states[name]
            took = f"  {elapsed[name]:6.1f}s" if name in elapsed else ""
            lines.append(f" {_GLYPH[s]} {name:<32} {s:<8}{took}")
        return lines

    n_done = sum(1 for s in list(raw.values()) + list(gold.values()) if s == DONE)
    n_all = len(raw) + len(gold)
    out = panel("RAW", raw)
    if gold:
        out += panel("GOLD", gold)
    out.append(f"   {n_done}/{n_all} done   {wall:6.1f}s elapsed")
    return "\n".join(out)


class LivePainter:
    """Repaints the board frame in place at REFRESH_HZ until stopped.

    On a TTY: ANSI cursor-up rewrites (the rich.Live behavior). On a
    non-TTY stream: stays silent during the run and prints one final frame
    on stop, so logs capture the outcome without escape codes."""

    def __init__(self, board: StatusBoard, stream=None) -> None:
        self.board = board
        self.stream = stream if stream is not None else sys.stdout
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._last_lines = 0

    def _paint(self) -> None:
        frame = render(self.board)
        if self._last_lines:
            self.stream.write(f"\x1b[{self._last_lines}F\x1b[0J")
        self.stream.write(frame + "\n")
        self.stream.flush()
        self._last_lines = frame.count("\n") + 1

    def _loop(self) -> None:
        while not self._stop.wait(1.0 / REFRESH_HZ):
            self._paint()
            if self.board.finished():
                break

    def __enter__(self) -> "LivePainter":
        if self.stream.isatty():
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._paint()
        else:  # non-TTY: one clean final frame
            self.stream.write(render(self.board) + "\n")
            self.stream.flush()
