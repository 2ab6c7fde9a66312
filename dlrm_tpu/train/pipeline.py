"""Overlapped train pipeline: host batch prep / H2D transfer / device step.

Capability parity with torchrec's TrainPipelineSparseDist 3-stage overlap
(torchrec_dlrm/dlrm_main.py:63, 478-480: copy / input-dist / fwd-bwd). On TPU
the stages map to:

  stage 1  host-side batch materialization (numpy padding, multi-hot
           expansion) — runs in a background thread;
  stage 2  host->device transfer (device_put / sharded put) — async, issued
           `depth` batches ahead;
  stage 3  the jitted train step — dispatched asynchronously; XLA overlaps the
           butterfly all-to-all with the bottom MLP inside the step itself.

The prefetcher keeps `depth` device batches in flight, so the host loop is
never the bottleneck unless batch prep exceeds a full step time.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

from dlrm_tpu.data.batch import Batch


class DevicePrefetcher:
    """Wraps a host-batch iterable; yields device batches `depth` ahead."""

    _DONE = object()

    def __init__(
        self,
        loader: Iterable,
        to_device: Callable,
        depth: int = 2,
    ):
        self.loader = loader
        self.to_device = to_device
        self.depth = max(1, depth)

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        """Delegate the trainer-epoch shuffle hook to the wrapped loader
        (CriteoBinFile.set_epoch) so resume fast-forward stays correct when
        the loader is prefetcher-wrapped (--num-workers>0); no-op when the
        wrapped loader has no epoch-dependent state."""
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __iter__(self) -> Iterator[Batch]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()
        err = []

        def put(item) -> bool:
            """Bounded put that aborts when the consumer has gone away
            (early break / exception) instead of blocking forever with
            device batches pinned in the queue."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for hb in self.loader:
                    if not put(self.to_device(hb)):
                        return
            except BaseException as e:  # surface worker errors
                err.append(e)
            finally:
                put(self._DONE)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        done = False
        try:
            while True:
                item = q.get()
                if item is self._DONE:
                    done = True
                    break
                yield item
        finally:
            stop.set()
            try:  # unblock the producer and release queued device batches
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
        if done and err:
            raise err[0]


class PipelinedTrainer:
    """progress()-style stepping (TrainPipelineSparseDist.progress analog):
    construct with the step fn and state, call progress(iterator) per step.

    lr may be a constant, a zero-arg callable, or an LRPolicy-like object
    with .lr/.step() — the policy is STEPPED here so schedules advance."""

    def __init__(self, train_step, params, opt_state, lr_fn):
        self.train_step = train_step
        self.params = params
        self.opt_state = opt_state
        self.lr_fn = lr_fn
        self.step_count = 0

    def _next_lr(self):
        if hasattr(self.lr_fn, "lr") and hasattr(self.lr_fn, "step"):
            lr = self.lr_fn.lr
            self.lr_fn.step()
            return lr
        return self.lr_fn() if callable(self.lr_fn) else self.lr_fn

    def progress(self, it: Iterator[Batch]):
        batch = next(it)  # raises StopIteration at epoch end, like torchrec
        lr = self._next_lr()
        self.params, self.opt_state, loss, probs = self.train_step(
            self.params, self.opt_state, batch, lr
        )
        self.step_count += 1
        return loss, probs


class HostPrefetcher(DevicePrefetcher):
    """Host-side analog of torch DataLoader(num_workers>0): a background
    thread materializes host batches `depth` ahead (--num-workers,
    dlrm_s_pytorch.py:997; one thread suffices because batch prep releases
    the GIL in numpy/the native builder). Re-iterable: each __iter__ spawns
    a fresh producer. Exactly DevicePrefetcher with an identity transform —
    the queue/drain/error machinery is shared."""

    def __init__(self, loader: Iterable, depth: int = 2):
        super().__init__(loader, lambda hb: hb, depth)
