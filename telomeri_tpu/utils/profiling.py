"""Device tracing hooks (SURVEY.md §6 "Tracing / profiling").

The reference has stage timing only; here the CLI flag --trace DIR (and env
TELOMERI_TRACE=DIR) wraps the device phase in a jax.profiler trace viewable with
TensorBoard / xprof (score+walk+merge region only, matching SURVEY.md §4.3's timed
region)."""

from __future__ import annotations

import os
from contextlib import contextmanager, nullcontext

from telomeri_tpu.utils.logging import log


@contextmanager
def _trace(trace_dir: str):
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    log.info("jax.profiler trace -> %s", trace_dir)
    with jax.profiler.trace(trace_dir):
        yield


def maybe_trace(trace_dir: str | None):
    """Context manager: jax.profiler.trace(dir) when dir (or $TELOMERI_TRACE) is set."""
    trace_dir = trace_dir or os.environ.get("TELOMERI_TRACE")
    if not trace_dir:
        return nullcontext()
    return _trace(trace_dir)
