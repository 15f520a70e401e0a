"""Concurrent prefetch loader (reference num_worker_per_gpu=4 +
prefetch_mode analog — options/...stage_I...yml:29-31)."""

import time

import numpy as np
import pytest

from pgtformer_tpu.data.loader import PrefetchLoader, _batch_orders


class SlowDataset:
    """Deterministic synthetic dataset with a controllable per-sample
    latency that releases the GIL (sleep), standing in for cv2 work."""

    def __init__(self, n=32, delay=0.0, fail_at=None):
        self.n = n
        self.delay = delay
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError(f"boom at {i}")
        if self.delay:
            time.sleep(self.delay)
        rng = np.random.default_rng(i)
        return {"gt": rng.normal(size=(2, 4, 4, 3)).astype(np.float32),
                "lq": np.full((2, 4, 4, 3), i, np.float32),
                "path": f"clip/{i}"}


def _materialize(loader):
    return [{k: (v.copy() if isinstance(v, np.ndarray) else list(v))
             for k, v in b.items()} for b in loader]


def test_loader_matches_sync_order_and_content():
    ds = SlowDataset(n=37)
    kw = dict(batch_size=4, shuffle=True, seed=3, drop_last=True,
              keys=("gt", "lq"))
    sync = _materialize(PrefetchLoader(ds, backend="sync", **kw))
    conc = _materialize(PrefetchLoader(ds, num_workers=4, prefetch=2,
                                       backend="thread", **kw))
    assert len(sync) == len(conc) == 37 // 4
    for a, b in zip(sync, conc):
        np.testing.assert_array_equal(a["gt"], b["gt"])
        np.testing.assert_array_equal(a["lq"], b["lq"])


def test_loader_epoch_advances_shuffle():
    ds = SlowDataset(n=16)
    loader = PrefetchLoader(ds, batch_size=4, shuffle=True, seed=0,
                            num_workers=2, keys=("lq",))
    e0 = _materialize(loader)
    e1 = _materialize(loader)
    ids0 = [b["lq"][:, 0, 0, 0, 0].tolist() for b in e0]
    ids1 = [b["lq"][:, 0, 0, 0, 0].tolist() for b in e1]
    assert ids0 != ids1                       # reshuffled per epoch
    assert sorted(sum(ids0, [])) == sorted(sum(ids1, []))  # same coverage
    # matches the documented deterministic order (seed + epoch)
    expect = _batch_orders(16, 4, True, 0, True)
    np.testing.assert_array_equal(
        np.concatenate([b["lq"][:, 0, 0, 0, 0] for b in e0]).astype(int),
        np.concatenate(expect))


def test_loader_propagates_worker_errors():
    ds = SlowDataset(n=8, fail_at=5)
    loader = PrefetchLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                            keys=("gt",))
    with pytest.raises(RuntimeError, match="boom"):
        _materialize(loader)


def test_loader_overlaps_consumer_time():
    """With a slow consumer, worker prefetch must hide most of the
    per-sample load latency (the chip-starvation scenario VERDICT r2 #3)."""
    delay = 0.02
    ds = SlowDataset(n=24, delay=delay)
    kw = dict(batch_size=4, shuffle=False, drop_last=True, keys=("gt",))
    consume = 4 * delay * 1.2   # device-step stand-in > batch load time / W

    def run(loader):
        t0 = time.perf_counter()
        for _ in loader:
            time.sleep(consume)
        return time.perf_counter() - t0

    t_sync = run(PrefetchLoader(ds, backend="sync", **kw))
    t_conc = run(PrefetchLoader(ds, num_workers=4, prefetch=2,
                                backend="thread", **kw))
    # sync pays load+consume serially; concurrent should approach
    # max(load/W, consume) per batch — require a robust 25% win
    assert t_conc < 0.75 * t_sync, (t_sync, t_conc)


def test_loader_tail_batch_and_len():
    ds = SlowDataset(n=10)
    keep = PrefetchLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                          num_workers=2, keys=("gt",))
    assert len(keep) == 3
    batches = _materialize(keep)
    assert [b["gt"].shape[0] for b in batches] == [4, 4, 2]
    drop = PrefetchLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                          num_workers=2, keys=("gt",))
    assert len(drop) == 2
    assert len(_materialize(drop)) == 2
