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
