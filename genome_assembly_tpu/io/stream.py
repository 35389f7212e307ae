"""Double-buffered host->device batch feeding (streaming executor).

The pipeline-parallel analogue in SURVEY.md section 2.2: host decode /
2-bit packing -> device compute, overlapped.  A worker thread stages the
NEXT batch's host->device transfers while the device computes on the
current one, so the scan kernels never wait on PCIe/relay transfer latency
(which dominates exactly when batches are large enough to keep the MXU/VPU
busy).  The reference has no analogue -- it is single-threaded and reads
with fgets one line at a time (binning.c:1154-1166).

Ordering is preserved; the queue depth bounds host+device staging memory
to ``depth`` batches.  Any exception in the worker is re-raised at the
consuming end so failures are not silent.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Sequence


class DeviceFeeder:
    """Iterate device-resident batches with transfer/compute overlap.

    items: any iterable of host batches.
    stage: host batch -> device arrays (e.g. jax.device_put of its arrays);
      runs on the worker thread.  jax dispatches transfers asynchronously,
      so by the time the consumer receives a batch its transfer is already
      in flight or complete.
    depth: max staged batches (2 = classic double buffering).
    """

    _DONE = object()

    def __init__(
        self,
        items: Iterable,
        stage: Callable,
        *,
        depth: int = 2,
    ) -> None:
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None

        def work() -> None:
            try:
                for it in items:
                    self._q.put(stage(it))
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                self._thread.join()
                if self._err is not None:
                    raise self._err
                return
            yield item


def feed_read_batches(batches: Sequence, *, depth: int = 2) -> Iterator:
    """Stage reads_io batches: (codes, lengths, read_ids) device arrays."""
    import jax
    import jax.numpy as jnp

    def stage(b):
        return (
            jax.device_put(jnp.asarray(b.codes)),
            jax.device_put(jnp.asarray(b.lengths)),
            jax.device_put(jnp.asarray(b.read_ids)),
        )

    return iter(DeviceFeeder(batches, stage, depth=depth))
