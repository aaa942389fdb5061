"""Config-driven data module with a background-prefetch loader.

Replaces ``DataModuleFromConfig`` (ref src/data/preprocessing/
data_modules.py:40-146) minus torch DataLoader workers: items are produced by
a thread pool (PIL/numpy release the GIL on the hot ops) and collated into
numpy batches; a bounded queue prefetches ahead of the device so the TPU
never waits on the host when the C++ patch ops are enabled. Shuffle on train
only, per-epoch reseed, drop_last for static batch shapes (XLA requirement).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, Optional

import numpy as np

from ..config import instantiate_from_config


def collate(items) -> Dict[str, Any]:
    """Stack numpy-able fields; keep strings/objects as lists."""
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        first = vals[0]
        if isinstance(first, (str, bytes)):
            out[key] = list(vals)
        else:
            try:
                out[key] = np.stack([np.asarray(v) for v in vals])
            except Exception:  # ragged -> keep as list
                out[key] = list(vals)
    return out


class _Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 0,
        seed: int = 23,
        prefetch: int = 4,
        drop_last: bool = True,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(num_workers, 0)
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        # Multi-host: each process reads a disjoint strided slice of the same
        # seed-shared global order (torch DistributedSampler analogue; the
        # reference gets this from Lightning DDP, ref train.py:162).
        self.shard_id = shard_id
        self.num_shards = max(num_shards, 1)
        self._epoch = 0

    def _padded_total(self) -> int:
        """Global order length after padding to a multiple of num_shards.

        Multi-host shards MUST be equal-length: train/eval steps and orbax
        saves are collective over the global mesh, so a process with one
        extra batch dispatches one extra collective and the cluster
        deadlocks at epoch end. torch's DistributedSampler pads the order by
        repeating leading indices for exactly this reason; we match it.
        """
        n = len(self.dataset)
        if self.num_shards <= 1:
            return n
        return -(-n // self.num_shards) * self.num_shards

    def _local_len(self) -> int:
        return self._padded_total() // self.num_shards

    def __len__(self):
        n = self._local_len() // self.batch_size
        if not self.drop_last and self._local_len() % self.batch_size:
            n += 1
        return n

    def __call__(self) -> Iterator[Dict[str, Any]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
        if self.num_shards > 1:
            pad = self._padded_total() - len(order)
            if pad:  # repeat leading indices (DistributedSampler semantics)
                order = np.concatenate([order, order[:pad]])
            order = order[self.shard_id :: self.num_shards]
        self._epoch += 1
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size)
        ]
        if not self.drop_last and len(order) % self.batch_size:
            batches.append(order[-(len(order) % self.batch_size) :])

        if self.num_workers <= 0:
            for idxs in batches:
                yield collate([self.dataset[int(i)] for i in idxs])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                for idxs in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(lambda i: self.dataset[int(i)], idxs))
                    q.put(collate(items))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


class WrappedDataset:
    """Wrap an arbitrary object into an indexable dataset (ref data_modules.py:28-37)."""

    def __init__(self, dataset):
        self.data = dataset

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.data[idx]


class DataModuleFromConfig:
    def __init__(
        self,
        batch_size: int,
        train=None,
        validation=None,
        test=None,
        predict=None,
        wrap: bool = False,
        num_workers: Optional[int] = None,
        shuffle_test_loader: bool = False,
        use_worker_init_fn: bool = False,
        shuffle_val_dataloader: bool = False,
        persistent_workers: bool = False,
        seed: int = 23,
        **_: Any,
    ):
        self.batch_size = batch_size
        self.num_workers = num_workers if num_workers is not None else batch_size * 2
        self.seed = seed
        self.wrap = wrap
        self.dataset_configs: Dict[str, Any] = {}
        for name, cfg in (
            ("train", train),
            ("validation", validation),
            ("test", test),
            ("predict", predict),
        ):
            if cfg is not None:
                self.dataset_configs[name] = cfg
        self.datasets: Dict[str, Any] = {}
        self._shuffle_val = shuffle_val_dataloader
        self._shuffle_test = shuffle_test_loader

    def prepare_data(self):  # parity no-op (ref data_modules.py:75-78)
        pass

    def setup(self, stage: Optional[str] = None):
        self.datasets = {
            k: instantiate_from_config(cfg) for k, cfg in self.dataset_configs.items()
        }
        if self.wrap:
            self.datasets = {k: WrappedDataset(v) for k, v in self.datasets.items()}

    def _parallel_context(self):
        """(shard_id, num_shards) from the JAX distributed runtime — one data
        shard per process so multi-host runs never duplicate items. Lazily
        imported; single-process (the common case) is (0, 1)."""
        try:
            import jax

            return jax.process_index(), jax.process_count()
        except Exception:  # noqa: BLE001 — jax not initialized yet
            return 0, 1

    def _loader(self, split: str, shuffle: bool) -> _Loader:
        shard_id, num_shards = self._parallel_context()
        return _Loader(
            self.datasets[split],
            batch_size=self.batch_size,
            shuffle=shuffle,
            num_workers=self.num_workers,
            seed=self.seed,
            shard_id=shard_id,
            num_shards=num_shards,
        )

    def train_dataloader(self):
        return self._loader("train", shuffle=True)()

    def val_dataloader(self):
        return self._loader("validation", shuffle=self._shuffle_val)()

    def test_dataloader(self):
        return self._loader("test", shuffle=self._shuffle_test)()

    def predict_dataloader(self):
        return self._loader("predict", shuffle=False)()
