"""Asynchronous host-side prefetching for per-image analysis loops.

The reference's workflow steps read, decode and correct each photograph
inline with the analysis (`analysis_mass.py` hot loop) — on a TPU the
host JPEG decode (tens of ms per 4K frame) serializes with device
compute that takes about as long, so the chip idles half the time.
``prefetch_map`` overlaps them: a small thread pool runs the read
function for upcoming items while the caller consumes the current one
(OpenCV releases the GIL during decode; JAX dispatch is thread-safe).

Failures are reported per item (the worker result carries the exception)
so a corrupt frame skips without tearing down the pool — matching the
best-effort semantics of the workflow loops.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Optional, Tuple

__all__ = ["prefetch_map", "PrefetchResult", "default_workers"]


class PrefetchResult:
    """Outcome of one prefetched load: ``value`` or ``error``."""

    __slots__ = ("item", "value", "error")

    def __init__(self, item, value=None, error: Optional[BaseException] = None):
        self.item = item
        self.value = value
        self.error = error

    @property
    def ok(self) -> bool:
        return self.error is None


def default_workers() -> int:
    """Worker count scaled to the host: one decode thread per core, capped
    (decode is ~40 ms/frame/core; more threads than cores just contend)."""
    import os

    return max(1, min(8, os.cpu_count() or 1))


def prefetch_map(
    fn: Callable,
    items: Iterable,
    depth: Optional[int] = None,
    workers: Optional[int] = None,
) -> Iterator[PrefetchResult]:
    """Yield ``PrefetchResult`` for ``fn(item)`` over ``items``, keeping up
    to ``depth`` loads in flight ahead of the consumer.

    Results are yielded in input order.  ``depth <= 0`` degrades to the
    plain sequential loop (no threads).  ``workers``/``depth`` default to
    the host core count (``depth = workers + 1`` so the pool never idles
    while the consumer holds the oldest future).
    """
    items = list(items)
    if workers is None:
        workers = default_workers()
    if depth is None:
        depth = workers + 1
    if depth <= 0 or len(items) <= 1:
        for item in items:
            try:
                yield PrefetchResult(item, value=fn(item))
            except Exception as exc:  # noqa: BLE001 - best-effort loop
                yield PrefetchResult(item, error=exc)
        return

    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        pending = []
        index = 0
        # Prime the pipeline.
        while index < len(items) and len(pending) < depth:
            pending.append((items[index], pool.submit(fn, items[index])))
            index += 1
        while pending:
            item, future = pending.pop(0)
            # Refill before blocking on the oldest future so the pool
            # keeps working while we wait.
            while index < len(items) and len(pending) < depth:
                pending.append((items[index], pool.submit(fn, items[index])))
                index += 1
            try:
                yield PrefetchResult(item, value=future.result())
            except Exception as exc:  # noqa: BLE001
                yield PrefetchResult(item, error=exc)
