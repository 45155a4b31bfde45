"""Async input staging: host->device prefetch pipeline.

TPU-native replacement for the reference's whole staging stack —
``tf.staged`` DataBufferPut/Take ops (python/ops/prefetch.py:54-120,
core/kernels/data_buffer_ops.cc), the PrefetchRunner background threads
(python/training/prefetch_runner.py), and the SmartStage graph pass
(common_runtime/graph_execution_state.cc:648) that grew the staged
subgraph for IO/compute overlap.

On TPU none of that needs a graph pass: XLA dispatch is already async, so
overlap comes from (a) doing the host work (parsing, packing) in background
threads and (b) moving batches to device memory *ahead* of the consumer
with ``jax.device_put``. The jitted step then starts immediately on
device-resident data while the host prepares the next batches — the
Stage/Unstage pair collapses into a bounded queue of device arrays.

``Prefetcher`` also plays the AutoMicroBatch staging role: with
``depth >= 2`` the device never waits for the host unless the host is the
true bottleneck (then: raise ``workers``).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax

_END = object()


class Prefetcher:
    """Background host-pack + device-put pipeline over a batch iterator.

    Args:
      it: source iterator of raw host batches.
      prepare: host-side packing fn (e.g. ``trainer.prepare_batch``) —
        runs in the worker threads; its outputs (pytrees of arrays) are
        moved to device here, not in the consumer.
      depth: max staged batches (the DataBuffer capacity analog).
      workers: host packing threads (PrefetchRunner thread count analog).
      device_put: optional placement fn (defaults to jax.device_put with
        default placement; sharded trainers pass their batch sharding).
    """

    def __init__(
        self,
        it: Iterable,
        prepare: Optional[Callable] = None,
        depth: int = 2,
        workers: int = 1,
        device_put: Optional[Callable] = None,
    ):
        self._src = iter(it)
        self._prepare = prepare or (lambda x: x)
        self._put = device_put if device_put is not None else jax.device_put
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._src_lock = threading.Lock()
        self._seq = 0
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._run, daemon=True, name=f"prefetch-{i}")
            for i in range(max(1, workers))
        ]
        self._next_emit = 0
        self._emit_cv = threading.Condition()
        for t in self._threads:
            t.start()

    def _run(self):
        while not self._stop.is_set():
            with self._src_lock:
                seq = self._seq
                try:
                    raw = next(self._src)
                except StopIteration:
                    raw = _END
                except Exception as e:  # source error: surface, don't hang
                    raw = e
                self._seq += 1
            if raw is _END:
                self._emit(seq, _END)
                return
            if isinstance(raw, Exception):
                self._emit(seq, raw)
                return
            try:
                staged = self._put(self._prepare(raw))
            except Exception as e:  # surfaced on the consumer side
                staged = e
            self._emit(seq, staged)

    def _emit(self, seq: int, item):
        """Preserve source order across workers (elastic thread speeds must
        not reorder the stream — determinism for tests/repro): a turnstile —
        each worker waits for its sequence number's turn to enqueue."""
        with self._emit_cv:
            while seq != self._next_emit and not self._stop.is_set():
                self._emit_cv.wait(0.05)
            if self._stop.is_set():
                return
        self._q.put(item)  # may block when the buffer is full
        with self._emit_cv:
            self._next_emit += 1
            self._emit_cv.notify_all()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _END:
            self._stop.set()
            raise StopIteration
        if isinstance(item, Exception):
            self._stop.set()
            raise item
        return item

    def close(self):
        self._stop.set()
        # drain so blocked workers can exit
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def staged(it: Iterable, prepare: Optional[Callable] = None, depth: int = 2,
           workers: int = 1, device_put: Optional[Callable] = None) -> Prefetcher:
    """``tf.staged`` analog (python/ops/prefetch.py:54): wrap an input
    iterator into an async staged pipeline."""
    return Prefetcher(it, prepare=prepare, depth=depth, workers=workers,
                      device_put=device_put)
