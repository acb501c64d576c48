"""Host→device prefetch: overlap batch k+1's transfer with step k's compute.

The round-3 roofline showed the real training loop is H2D-bound on a
tunneled TPU link: the synchronous ``shard_batch(plan, feeder.get())`` on
the critical path cost 592 ms/step (f32 spectrogram wire) against a
6 ms/step compute — the loop ran at transfer + compute instead of
max(transfer, compute).  The reference intended queue-based overlap via its
``tf.FIFOQueue`` enqueue thread (``/root/reference/datasets/datafeeder.py:
157-167``); this is the jax equivalent: a background thread pulls host
batches and issues the (async) sharded ``device_put``, so the transfer of
the NEXT batch rides the link while the current step computes.  Depth 1 is
already the full win; the default 2 also absorbs feeder jitter.

Order is preserved (single producer thread, FIFO queue), so a pipelined run
consumes the exact same batch sequence as the synchronous loop — equality
is asserted in ``tests/test_train.py::test_prefetch_matches_synchronous``.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional


class DevicePrefetcher:
    """Background pipeline: ``source()`` -> ``place()`` -> bounded queue.

    ``source`` blocks until a host batch is available (e.g.
    ``DataFeeder.get``); ``place`` moves it to the device(s) (e.g.
    ``lambda b: Batch(*shard_batch(plan, b))``) — ``jax.device_put`` only
    dispatches the copy, so the producer thread never holds the GIL for
    the transfer itself.  Exceptions in either callable propagate to the
    consumer's next :meth:`get`.
    """

    def __init__(self, source: Callable[[], Any],
                 place: Callable[[Any], Any], depth: int = 2):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._source = source
        self._place = place
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self) -> None:
        try:
            while not self._stop.is_set():
                item = self._place(self._source())
                while not self._stop.is_set():
                    try:
                        self._queue.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — must reach the consumer
            self._error = e

    def get(self, timeout: Optional[float] = None) -> Any:
        """Next device-resident batch, in source order.

        Blocks indefinitely by default — matching the synchronous
        ``feeder.get()`` loop this pipeline replaces, where a slow (but
        healthy) feeder simply stalls the step rather than killing the
        run.  Pass ``timeout`` (seconds) to bound the wait instead.  An
        unbounded wait is not a silent one: after every 60 s of idling a
        diagnostic line is logged so a wedged (not merely slow) feeder is
        visible in an unattended run's log instead of looking like a hang.
        """
        waited = 0.0
        while True:
            try:
                return self._queue.get(timeout=0.5)
            except queue.Empty:
                # drained: only now can a producer error be the cause
                if self._error is not None:
                    raise self._error
                if not self._thread.is_alive():
                    # the producer may have stored its error between our
                    # check above and its exit — re-check before reporting
                    # the generic failure so the root cause isn't dropped
                    if self._error is not None:
                        raise self._error
                    raise RuntimeError("prefetch producer exited")
                waited += 0.5
                if waited % 60.0 < 0.25:  # once per minute of waiting
                    from ..utils import log
                    log(f"prefetcher idle {waited:.0f}s — feeder slow or "
                        f"stalled (producer thread alive, queue empty)")
                if timeout is not None:
                    timeout -= 0.5
                    if timeout <= 0:
                        raise TimeoutError(
                            "prefetcher produced no batch in time")

    def stop(self) -> None:
        """Stop the producer; safe to call twice.  Queued batches are
        dropped (device buffers are freed by GC)."""
        self._stop.set()
        self._thread.join(timeout=10.0)
