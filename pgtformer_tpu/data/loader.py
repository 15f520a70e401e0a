"""Concurrent prefetching batch loader for training.

The reference trains with 4 DataLoader worker processes + prefetch
(options/release_train_stage_I_need_align_version.yml:29-31
`num_worker_per_gpu: 4`, `prefetch_mode`); our on-the-fly blind
degradation (data/degradations.py blind_degrade_clip: per-frame cv2 blur +
JPEG round-trips) is likewise far too slow to feed a ~290 ms/step trainer
from a synchronous loop.  This loader overlaps sample loading with device
compute:

  * `num_workers` concurrent workers each assemble complete batches
    (worker w handles batch ordinals w, w+W, ... — batch composition is
    identical to the synchronous `clip_batches`, so runs are reproducible);
  * a bounded reorder buffer yields batches strictly in order with up to
    `prefetch` batches resident;
  * thread backend by default: the hot loader work is cv2/numpy which
    release the GIL, and threads avoid re-importing jax per worker on this
    class of host.  `backend="process"` (spawn) is available for
    many-core hosts where Python-side work dominates.

Note on the batched on-device noise variants (degradations.py:263-352):
they cannot replace the loader's noise stage for the blind pipeline — the
reference order is blur -> downsample -> **noise -> JPEG** (degradations
applies JPEG *after* noise, :483-489), so noise must happen host-side
before the cv2 JPEG round-trip.  They remain available for recipes whose
noise is terminal.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def _batch_orders(n: int, batch_size: int, shuffle: bool, seed: int,
                  drop_last: bool) -> List[np.ndarray]:
    """Per-batch index lists, identical to data/vfhq.clip_batches."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    batches = [order[i:i + batch_size]
               for i in range(0, n, batch_size)]
    if batches and len(batches[-1]) < batch_size and drop_last:
        batches.pop()
    return batches


def _collate(samples: Sequence[Dict[str, np.ndarray]],
             keys=("gt", "lq", "llq")) -> Dict[str, np.ndarray]:
    out = {k: np.stack([s[k] for s in samples])
           for k in keys if k in samples[0]}
    if "path" in samples[0]:
        out["path"] = [s["path"] for s in samples]
    return out


class PrefetchLoader:
    """Iterable over collated batches with worker concurrency + prefetch.

    Each `iter()` pass is one epoch; `epoch` advances the shuffle seed per
    pass (`seed + epoch`), mirroring a torch DistributedSampler's
    set_epoch.  Exceptions raised in workers propagate to the consumer.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 drop_last: bool = True, backend: str = "thread",
                 keys=("gt", "lq", "llq"), reseed_dataset: bool = False):
        assert backend in ("thread", "process", "sync")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.backend = backend
        self.keys = tuple(keys)
        self.epoch = 0
        # reseed_dataset: advance the dataset's own sample seed each epoch
        # so per-index randomness (degradation draws, hflip) is FRESH every
        # pass — the reference's torch datasets consume global numpy state
        # and therefore redraw degradations each epoch; our deterministic
        # (seed, index) rng would otherwise freeze them, which makes small
        # sets far more memorizable for the discriminator than the
        # reference's behavior.  Safe to mutate at __iter__ time: epochs
        # run sequentially and each epoch's workers join before the next
        # __iter__ (see _iter_thread's finally).
        self.reseed_dataset = reseed_dataset and hasattr(dataset, "seed")
        self._dataset_seed0 = getattr(dataset, "seed", 0)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = _batch_orders(len(self.dataset), self.batch_size,
                                self.shuffle, self.seed + self.epoch,
                                self.drop_last)
        if self.reseed_dataset:
            self.dataset.seed = self._dataset_seed0 + 100003 * self.epoch
        self.epoch += 1
        if not batches:
            return iter(())
        if self.backend == "sync":
            return self._iter_sync(batches)
        if self.backend == "process":
            return self._iter_process(batches)
        return self._iter_thread(batches)

    def _load(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        return _collate([self.dataset[int(i)] for i in idxs], self.keys)

    def _iter_sync(self, batches):
        for idxs in batches:
            yield self._load(idxs)

    def _iter_thread(self, batches):
        W = min(self.num_workers, len(batches))
        done: Dict[int, object] = {}
        cv = threading.Condition()
        # cap resident completed batches: worker w blocks until the
        # consumer is within `prefetch` of its next ordinal
        yielded = [0]
        stop = threading.Event()

        def worker(w: int):
            try:
                for ordinal in range(w, len(batches), W):
                    with cv:
                        while (ordinal - yielded[0] >= self.prefetch + W
                               and not stop.is_set()):
                            cv.wait(timeout=0.5)
                    if stop.is_set():
                        return
                    batch = self._load(batches[ordinal])
                    with cv:
                        done[ordinal] = batch
                        cv.notify_all()
            except BaseException as e:  # surfaced to the consumer
                with cv:
                    done[-1 - w] = e
                    cv.notify_all()

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(W)]
        for t in threads:
            t.start()
        try:
            for ordinal in range(len(batches)):
                with cv:
                    while ordinal not in done:
                        errs = [k for k in done if k < 0]
                        if errs:
                            raise done[errs[0]]
                        cv.wait(timeout=0.5)
                    batch = done.pop(ordinal)
                    yielded[0] = ordinal + 1
                    cv.notify_all()
                yield batch
        finally:
            stop.set()
            with cv:
                cv.notify_all()
            for t in threads:
                t.join(timeout=5.0)

    def _iter_process(self, batches):
        import multiprocessing as mp
        ctx = mp.get_context("spawn")
        with ctx.Pool(min(self.num_workers, len(batches)),
                      initializer=_proc_init,
                      initargs=(self.dataset, self.keys)) as pool:
            for batch in pool.imap(_proc_load, [b.tolist() for b in batches],
                                   chunksize=1):
                yield batch


_PROC_STATE: dict = {}


def _proc_init(dataset, keys):
    _PROC_STATE["dataset"] = dataset
    _PROC_STATE["keys"] = keys


def _proc_load(idxs):
    ds = _PROC_STATE["dataset"]
    return _collate([ds[int(i)] for i in idxs], _PROC_STATE["keys"])


def device_prefetch(iterator, put, depth: int = 2):
    """Run `put(batch)` (jax.device_put / shard_batch) one-or-more batches
    AHEAD of the consumer, on a dedicated thread.

    The host->device upload of batch k+1 then overlaps the device compute
    of batch k (the reference overlaps uploads via DataLoader
    `pin_memory`+`prefetch_mode`; under jax the dispatch thread would
    otherwise serialize upload -> step -> upload).  `depth` device-resident
    batches are kept in flight.  Exceptions (from the loader or the
    transfer) propagate to the consumer."""
    import queue as _queue

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    err: List[BaseException] = []

    def run():
        try:
            for b in iterator:
                q.put(put(b))
        except BaseException as e:
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
