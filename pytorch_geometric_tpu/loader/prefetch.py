"""PrefetchLoader + CachedLoader.

Reference: ``torch_geometric/loader/prefetch.py:52`` (async H2D copy on
CUDA streams) and ``loader/cache.py:21`` (GPU-side cache of filtered
batches). TPU equivalents: ``jax.device_put`` is already async — the
prefetcher walks one batch ahead so host sampling overlaps device
compute; the cache keeps device-resident pytrees keyed by batch index.
"""

from typing import Any, Callable, Iterator, Optional

import jax


class PrefetchLoader:
    """Wraps any batch iterable; device-puts batch i+1 while batch i is
    being consumed (reference ``prefetch.py:52``).

    ``num_threads > 0`` additionally moves the HOST side of the pipeline
    (sampling + collation, the expensive part of NeighborLoader batches)
    onto a producer thread feeding a bounded queue — host sampling then
    overlaps device compute, the TPU stand-in for the reference's
    DataLoader worker processes. ``jax.device_put`` itself is already
    async, so the plain mode only overlaps the H2D copy.
    """

    def __init__(self, loader, device: Optional[Any] = None,
                 num_threads: int = 0, queue_size: int = 2,
                 put: bool = True):
        """``put=False`` keeps batches host-side (numpy) — for consumers
        that restack several batches before one upload (e.g. the
        multi-step ``lax.scan`` training pattern); pulling a device
        array back to numpy costs a full D2H round trip."""
        self.loader = loader
        self.device = device
        self.num_threads = num_threads
        self.queue_size = queue_size
        self.put = put

    def __len__(self):
        return len(self.loader)

    def _put(self, batch):
        if not self.put:
            return batch
        if self.device is None:
            return jax.device_put(batch)
        return jax.device_put(batch, self.device)

    def _iter_threaded(self) -> Iterator:
        import queue
        import threading
        q: 'queue.Queue' = queue.Queue(maxsize=max(self.queue_size, 1))
        done = object()
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that notices consumer abandonment: without
            # the stop check, an abandoned iterator leaves the producer
            # blocked in q.put forever (leaked thread + device batches)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self.loader:
                    if not put(('item', self._put(b))):
                        return
            except BaseException as e:          # propagate to consumer
                put(('error', e))
                return
            put(('done', done))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == 'error':
                    raise payload
                if kind == 'done':
                    return
                yield payload
        finally:
            stop.set()
            # drain so a producer blocked in q.put returns, then join
            # briefly: a daemon thread killed at interpreter teardown
            # mid-C++-sampler-call aborts with std::terminate
            try:
                while True:
                    q.get_nowait()
            except Exception:
                pass
            t.join(timeout=5.0)

    def __iter__(self) -> Iterator:
        if self.num_threads > 0:
            yield from self._iter_threaded()
            return
        it = iter(self.loader)
        try:
            ahead = self._put(next(it))
        except StopIteration:
            return
        for nxt in it:
            nxt_dev = self._put(nxt)   # async dispatch
            yield ahead
            ahead = nxt_dev
        yield ahead


class CachedLoader:
    """Caches transformed device batches by position
    (reference ``cache.py:21``)."""

    def __init__(self, loader, transform: Optional[Callable] = None,
                 device: Optional[Any] = None):
        self.loader = loader
        self.transform = transform
        self.device = device
        self._cache = {}

    def __len__(self):
        return len(self.loader)

    def clear(self):
        self._cache.clear()

    def __iter__(self):
        for i, batch in enumerate(self.loader):
            if i in self._cache:
                yield self._cache[i]
                continue
            if self.transform is not None:
                batch = self.transform(batch)
            batch = (jax.device_put(batch, self.device)
                     if self.device is not None
                     else jax.device_put(batch))
            self._cache[i] = batch
            yield batch
