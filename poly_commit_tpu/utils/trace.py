"""Scoped phase timers — the reference's `print-trace` feature analogue.

The reference wraps every phase in ark_std::{start_timer!, end_timer!} pairs
compiled in under feature "print-trace" (SURVEY.md §5.1; e.g.
kzg10/mod.rs:61,165-208). Here the same tree of labeled scopes is enabled
with POLY_COMMIT_TRACE=1 and prints an indented enter/leave log with
wall-clock durations; `jax.profiler.TraceAnnotation` scopes are emitted too
so device traces carry the same labels under `jax.profiler`.
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time

_DEPTH = 0


def enabled() -> bool:
    return os.environ.get("POLY_COMMIT_TRACE", "") not in ("", "0")


@contextlib.contextmanager
def scope(label: str):
    """Timer scope; no-op unless POLY_COMMIT_TRACE is set."""
    global _DEPTH
    if not enabled():
        yield
        return
    indent = "··" * _DEPTH
    print(f"{indent}Start: {label}", file=sys.stderr)
    _DEPTH += 1
    t0 = time.perf_counter()
    ann = None
    try:
        import jax.profiler

        ann = jax.profiler.TraceAnnotation(label)
        ann.__enter__()
    except Exception:
        ann = None
    try:
        yield
    finally:
        if ann is not None:
            ann.__exit__(None, None, None)
        _DEPTH -= 1
        dt = time.perf_counter() - t0
        print(f"{indent}End: {label} {dt*1e3:.3f}ms", file=sys.stderr)


def traced(label: str):
    """Decorator form of :func:`scope` for whole phases — the analogue of
    the reference's per-function start_timer!/end_timer! pairs. Place under
    @classmethod: ``@classmethod`` / ``@traced("X::commit")`` / ``def …``."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if not enabled():
                return fn(*args, **kwargs)
            with scope(label):
                return fn(*args, **kwargs)

        return wrapper

    return deco
