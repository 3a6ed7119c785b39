"""Targeted suppression of known-benign Ray Data log noise.

Ray 2.49's schema-deduplication fast path (`transform_pyarrow.py:181`)
logs ``Failed to hash the schemas (for deduplication): unhashable type:
'dict'`` once per native Aggregate execution — an internal artifact of the
sort-based aggregate's mixed block-schema list, harmless (the code falls
back to the full unify) but it buries real warnings in bench/gate output
(VERDICT r2 #7). This module installs a message-scoped logging filter:
ONLY that exact known string is dropped; every other Ray warning still
flows. Call :func:`install` from session owners (bench.py, the correctness
gate, the pytest fixture) — library code never mutates global logging.
"""

from __future__ import annotations

import logging

_KNOWN_NOISE = ("Failed to hash the schemas (for deduplication)",)


class _KnownNoiseFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        try:
            msg = record.getMessage()
        except Exception:  # noqa: BLE001 - never let logging crash a run
            return True
        return not any(s in msg for s in _KNOWN_NOISE)


def runtime_env() -> dict:
    """``ray.init(runtime_env=...)`` fragment that installs the filter in
    every WORKER process too (the aggregate warning is also emitted from
    read/shuffle tasks and relayed to driver stdout, where a driver-side
    filter cannot reach it). The hook is a self-contained closure —
    cloudpickle ships it by VALUE; a module-level function would pickle by
    reference and fail in workers that don't have the repo on sys.path."""

    def _hook():
        import logging

        known = "Failed to hash the schemas (for deduplication)"

        class _F(logging.Filter):
            def filter(self, record):
                try:
                    return known not in record.getMessage()
                except Exception:  # noqa: BLE001
                    return True

        for name in (
            "ray.data._internal.arrow_ops.transform_pyarrow",
            "ray.data",
        ):
            lg = logging.getLogger(name)
            lg.addFilter(_F())
            for h in lg.handlers:
                h.addFilter(_F())

    return {"worker_process_setup_hook": _hook}


def install() -> None:
    """Attach the filter to the EMITTING logger (idempotent). Logging
    filters on ancestor loggers do not run for child-logger records, so
    the specific module logger is targeted; its handlers (added by Ray's
    log setup) get the filter too in case Ray re-parents them."""
    targets = ["ray.data._internal.arrow_ops.transform_pyarrow", "ray.data"]
    for name in targets:
        lg = logging.getLogger(name)
        if not any(isinstance(f, _KnownNoiseFilter) for f in lg.filters):
            lg.addFilter(_KnownNoiseFilter())
        for h in lg.handlers:
            if not any(isinstance(f, _KnownNoiseFilter) for f in h.filters):
                h.addFilter(_KnownNoiseFilter())
