"""Per-process broadcast-side cache for ``ray.get`` of ``ray.put`` refs.

Plasma zero-copies raw buffers, but Python containers (dicts, tuples of
arrays) still DESERIALIZE on every ``ray.get`` — calling it per batch
turns a broadcast side into a per-task CPU tax (measured ~40% of the
star-join query before caching). One deserialize per worker process,
keyed by object id, plus a short retry: a transient object-store hiccup
under session pressure must not fail a whole pipeline when the object is
trivially re-fetchable (observed once across hundreds of gate runs).
"""

from __future__ import annotations

import time

import ray

_CACHE: dict = {}


def bget(ref, retries: int = 3):
    """Cached ``ray.get`` with bounded retry on transient failures."""
    k = ref.hex() if hasattr(ref, "hex") else id(ref)
    v = _CACHE.get(k)
    if v is None:
        last = None
        for attempt in range(retries):
            try:
                v = ray.get(ref)
                break
            except Exception as exc:  # noqa: BLE001 - retry then re-raise
                last = exc
                time.sleep(0.2 * (2**attempt))
        else:
            raise last
        _CACHE[k] = v
    return v
