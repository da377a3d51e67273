"""Profiling hooks: jax.profiler traces around the step loop.

Replaces the reference's ``std::chrono`` printf timing
(``kernel.cu:1193-1243``) with proper device traces viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import pathlib


@contextlib.contextmanager
def trace(log_dir: str | pathlib.Path | None):
    """``with trace("out/profile"):`` — no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    pathlib.Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
