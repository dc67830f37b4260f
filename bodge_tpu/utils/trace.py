"""Profiler trace hooks (TensorBoard/Perfetto via jax.profiler)."""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed block.

    View with TensorBoard's profile plugin or ui.perfetto.dev.  Wrap whole
    jitted sweeps, not individual eager ops.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up as a span)."""
    with jax.profiler.TraceAnnotation(name):
        yield
