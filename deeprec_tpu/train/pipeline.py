"""Host-step pipeline: keep the host half of a host-index step K steps
ahead of device dispatch.

The host-index engine's per-step host work has two parts with different
concurrency rules:

  * **resolve** (key -> slot, mutates the index): must run
    single-threaded in STEP ORDER (native/deeprec_native.cc guards
    against concurrent resolves) — the role the reference's CPU hash
    maps play inside its gather kernels (kv_variable_ops.cc:315-362),
    hoisted one step ahead.
  * **transfer** (H2D of the wire buffer + dense + labels): order-free,
    but `jax.device_put` BLOCKS the calling thread for the duration of
    the copy (measured ~0.4 ms constant + ~100 MB/s on a tunneled
    chip; ~4.5 ms/step at Criteo shapes) — run inline it serializes
    with dispatch and dominates the loop.

This pipeline runs each stage on its own single-worker executor, chained
per item, so at steady state three things overlap: the device executing
step N, the transfer thread shipping step N+1, and the resolve thread
indexing step N+2. The main thread only dispatches jitted steps. This is
the production-loop form of the bench's "host half fits under the device
step" claim — resolve+H2D run inside the loop, not ahead of it.

Draining rule: anything that reads or rewrites table state off the step
path (checkpoint save, growth, eval, health fences, demotion) must see a
resolver that is EXACTLY as far as the device state — call
:meth:`drain` (consume the in-flight steps) before fence work. The
train loops (train/cli.py, benchmarks/soak.py) drain at their existing
fence points, where that work already lives.

Reference analog: the staged subgraph SmartStage grew around the IO ops
(graph_execution_state.cc:648) plus the PS's CPU-side lookup pipelining;
here it is an explicit 3-stage host pipeline feeding XLA's async queue.
"""
from __future__ import annotations

import threading
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


class HostStepPipeline:
    """Two-stage (resolve -> transfer) pipeline over prepacked batches.

    Args:
      resolve: step-order host stage — takes one source item, returns the
        jitted step's args with HOST (numpy) leaves. Runs on a single
        dedicated thread, in submission order (index mutation safe).
      transfer: device placement stage (default ``jax.device_put``).
        Runs on its own thread so the blocking H2D never stalls dispatch.
      depth: max in-flight items (2-3 hides resolve+transfer under any
        device step that is at least as long as the slowest stage).
    """

    def __init__(self, resolve: Callable[[Any], Any],
                 transfer: Optional[Callable[[Any], Any]] = None,
                 depth: int = 3):
        self._resolve = resolve
        self._transfer = transfer if transfer is not None else jax.device_put
        self._exR = ThreadPoolExecutor(1, thread_name_prefix="hidx-resolve")
        self._exT = ThreadPoolExecutor(1, thread_name_prefix="hidx-h2d")
        self._q: deque = deque()
        self.depth = max(1, int(depth))
        self._closed = False

    # -- core ------------------------------------------------------------
    def feed(self, item) -> None:
        """Schedule one source item through resolve -> transfer."""
        if self._closed:
            raise RuntimeError("pipeline closed")
        fr = self._exR.submit(self._resolve, item)
        ft = self._exT.submit(self._stage_t, fr)
        self._q.append(ft)

    def _stage_t(self, fr: Future):
        return self._transfer(fr.result())

    def take(self):
        """Oldest item, device-ready (blocks until its transfer lands)."""
        return self._q.popleft().result()

    def __len__(self) -> int:
        return len(self._q)

    # -- loop helpers ------------------------------------------------------
    def run(self, source: Iterable, step: Callable[[Any], None],
            fence_every: int = 0, on_fence: Optional[Callable] = None):
        """Drive ``step(args)`` over ``source`` with the pipeline primed
        ``depth`` ahead; every ``fence_every`` consumed items the pipeline
        is DRAINED (resolver == device state) and ``on_fence(n_done)``
        runs. The common loop shape of cli/soak/bench."""
        it = iter(source)
        done = 0
        exhausted = False
        while not exhausted or len(self):
            while not exhausted and len(self) < self.depth:
                try:
                    self.feed(next(it))
                except StopIteration:
                    exhausted = True
            if not len(self):
                break
            step(self.take())
            done += 1
            if fence_every and done % fence_every == 0:
                while len(self):          # drain: fence work must see a
                    step(self.take())     # resolver in lockstep w/ device
                    done += 1
                if on_fence is not None:
                    on_fence(done)
        return done

    def drain(self, step: Callable[[Any], None]) -> int:
        """Consume every in-flight item through ``step``; afterwards the
        resolver state matches the dispatched device state."""
        n = 0
        while len(self):
            step(self.take())
            n += 1
        return n

    def close(self) -> None:
        self._closed = True
        self._exR.shutdown(wait=False)
        self._exT.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
