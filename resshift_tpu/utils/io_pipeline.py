"""Host I/O pipelining for the inference entry points.

The reference's inference loop is strictly serial: read a batch, run the
sampler, write the PNGs, repeat (`/root/reference/sampler.py:267-291`) — the
accelerator idles through every host I/O phase.  On TPU that waste is
measurable: PNG-encoding one protocol batch (64 outputs at 256px) costs up to
~0.5 s of host time against ~1.37 s of device time, so the serial loop gives
away up to ~25% of eval wall-clock.  JAX dispatch is asynchronous — a jitted
sampler call returns an unforced device array immediately — so the fix is
pure pipelining, no device-side change:

- :func:`prefetch` — a background thread runs the (host-side, I/O-heavy)
  batch iterator ahead of the dispatch loop, bounded by ``depth``.
- :class:`AsyncWriter` — a background writer thread *forces* each result
  (``np.asarray`` blocks until the device finishes that batch) and fans the
  PNG encodes out to a small thread pool (cv2 releases the GIL in
  ``imwrite``), while the main thread is already dispatching the next batch.

Exceptions from either side are never dropped: a reader error re-raises from
the consuming iterator; a writer error re-raises from the next ``submit`` or
from ``close()``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator

__all__ = ["prefetch", "AsyncWriter"]

_SENTINEL = object()


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``it`` on a background thread, ``depth`` items ahead.

    The producing iterator runs host I/O (image reads, batching) while the
    consumer is busy dispatching device work.  StopIteration is propagated
    cleanly; a producer exception re-raises at the consumer's next pull.
    If the consumer abandons the generator early, the producer thread is
    unblocked and asked to stop at its next yield.
    """
    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def put_stoppable(item) -> bool:
        # Every producer-side put must stay abortable: if the consumer
        # abandons the generator while the bounded queue is full (normal
        # steady state), an unconditional q.put would deadlock against the
        # consumer's t.join() in the finally block below.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for item in it:
                if not put_stoppable(item):
                    return
            put_stoppable(_SENTINEL)
        except BaseException as e:  # re-raised on the consumer side
            put_stoppable(e)

    t = threading.Thread(target=run, name="io-prefetch", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        t.join()


class AsyncWriter:
    """Bounded background writer for inference outputs.

    ``submit(fn)`` enqueues a callable ``fn(pool)`` that runs on the single
    writer thread in submission order; ``pool`` is a shared
    :class:`ThreadPoolExecutor` the callable may use to parallelize PNG
    encodes.  The queue is bounded (``depth``) so device results cannot pile
    up in host memory if writing falls behind.  The first error raised by a
    job re-raises from the next :meth:`submit` or from :meth:`close`.
    """

    def __init__(self, depth: int = 2, encode_threads: int = 8):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None
        self._err_lock = threading.Lock()
        self._failed = False  # sticky: once set, later jobs drain without running
        self._pool = ThreadPoolExecutor(max_workers=encode_threads,
                                        thread_name_prefix="png-encode")
        self._thread = threading.Thread(target=self._run, name="io-writer",
                                        daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is _SENTINEL:
                return
            with self._err_lock:
                failed = self._failed
            if failed:
                continue  # drain the queue after a failure
            try:
                fn(self._pool)
            except BaseException as e:
                with self._err_lock:
                    self._failed = True
                    self._err = e

    def _check(self):
        with self._err_lock:
            err, self._err = self._err, None
        if err is not None:
            raise err

    def submit(self, fn: Callable) -> None:
        self._check()
        self._q.put(fn)

    def close(self) -> None:
        """Wait for all pending jobs; re-raise the first job error, if any."""
        self._q.put(_SENTINEL)
        self._thread.join()
        self._pool.shutdown(wait=True)
        self._check()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        # on an exception in the with-body, still drain but prefer that error
        try:
            self.close()
        except BaseException:
            if exc_type is None:
                raise
        return False
