"""Subprocess line reading with a REAL wall-clock deadline.

``for line in p.stdout`` blocks in readline, so an in-loop
``time.time() > deadline`` check is dead code while the child is silent
(stuck device init / stuck XLA compile — the exact hang class the
crash/preempt tests exist to cover). Pump lines on a daemon thread and
poll a queue instead.
"""

from __future__ import annotations

import queue
import threading
import time


def read_lines_with_deadline(p, timeout_s, on_line=None):
    """Collect the child's stdout lines until EOF or ``timeout_s``.

    ``on_line(line)`` (optional) runs per line; returning ``"stop"`` ends
    reading early. Returns ``(lines, timed_out)``; on timeout the child
    is killed before returning.
    """
    q = queue.Queue()

    def _reader():
        try:
            for line in p.stdout:
                q.put(line)
        finally:
            q.put(None)

    threading.Thread(target=_reader, daemon=True).start()
    lines = []
    deadline = time.time() + timeout_s
    while True:
        remaining = deadline - time.time()
        if remaining <= 0:
            p.kill()
            return lines, True
        try:
            line = q.get(timeout=min(remaining, 5.0))
        except queue.Empty:
            continue
        if line is None:
            return lines, False
        lines.append(line)
        if on_line is not None and on_line(line) == "stop":
            return lines, False
