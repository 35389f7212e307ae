"""Profiler hooks (SURVEY.md section 5.1).

Wraps jax.profiler trace capture (XPlane/Perfetto format, viewable in
TensorBoard or Perfetto) behind a context manager the CLI exposes as
``--trace DIR``.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Optional


@contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into trace_dir when set; no-op otherwise."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the trace timeline."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
