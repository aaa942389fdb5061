"""Loader worker semantics: per-epoch reshuffle + the process worker pool.

The reference gets both from torch: DataLoader(num_workers=16) process
workers (configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml:72) and
DistributedSampler.set_epoch per-epoch reshuffle via Lightning. Here the
thread pool is the default (native patch ops release the GIL) and
``worker_type: process`` provides the torch-equivalent process pool; both
must emit identical batch streams.
"""

import numpy as np
import pytest

from generative_detection_tpu.data.datamodule import DataModuleFromConfig, _Loader
from generative_detection_tpu.data.synthetic import SyntheticPatchTrain


def _item_keys(batches):
    """Order-sensitive per-item fingerprints for one epoch."""
    return np.concatenate([b["patch"].reshape(b["patch"].shape[0], -1).sum(1) for b in batches])


def _dm(**kw):
    dm = DataModuleFromConfig(
        batch_size=4,
        train=dict(
            target="generative_detection_tpu.data.synthetic.SyntheticPatchTrain",
            params=dict(length=12, patch_height=32),
        ),
        **kw,
    )
    dm.setup()
    return dm


def test_per_epoch_reshuffle():
    """Each train epoch draws a fresh shuffle order (DistributedSampler
    set_epoch semantics); a fresh module replays the same epoch sequence."""
    dm = _dm(num_workers=0)
    e0 = _item_keys(list(dm.train_dataloader()))
    e1 = _item_keys(list(dm.train_dataloader()))
    assert not np.array_equal(e0, e1), "epoch 1 replayed epoch 0's order"
    np.testing.assert_array_equal(np.sort(e0), np.sort(e1))  # same items, new order
    dm2 = _dm(num_workers=0)
    np.testing.assert_array_equal(e0, _item_keys(list(dm2.train_dataloader())))
    np.testing.assert_array_equal(e1, _item_keys(list(dm2.train_dataloader())))


def test_process_loader_matches_inline():
    """worker_type=process: identical batch stream to the inline loader
    across two epochs (reorder buffer preserves order), persistent workers,
    clean teardown."""
    dm_inline = _dm(num_workers=0)
    dm_proc = _dm(num_workers=2, worker_type="process")
    loader = dm_proc._loader("train", shuffle=True)
    for _ in range(2):  # two epochs through the SAME pool
        ref = list(dm_inline.train_dataloader())
        got = list(dm_proc.train_dataloader())
        assert len(got) == len(ref) == 3
        for rb, gb in zip(ref, got):
            np.testing.assert_array_equal(rb["patch"], gb["patch"])
            np.testing.assert_array_equal(rb["class_id"], gb["class_id"])
    pool = loader._pool
    assert pool is not None and len(pool.procs) == 2
    pids_epoch1 = [p.pid for p in pool.procs]
    assert all(p.is_alive() for p in pool.procs), "pool must persist across epochs"
    dm_proc.teardown()
    assert loader._pool is None
    import os

    for pid in pids_epoch1:
        with pytest.raises(OSError):  # ProcessLookupError: worker reaped
            os.kill(pid, 0)


class _Exploding(SyntheticPatchTrain):
    def __getitem__(self, idx):
        if idx == 5:
            raise ValueError("boom at idx 5")
        return super().__getitem__(idx)


def test_process_loader_propagates_worker_error():
    loader = _Loader(
        _Exploding(length=8, patch_height=32),
        batch_size=4,
        shuffle=False,
        num_workers=1,
        worker_type="process",
    )
    with pytest.raises(RuntimeError, match="boom at idx 5"):
        list(loader())
    assert loader._pool is None  # failed epoch rebuilds the pool
    loader.shutdown()


class _SlowTail(SyntheticPatchTrain):
    def __getitem__(self, idx):
        if idx >= 4:
            import time

            time.sleep(120)
        return super().__getitem__(idx)


def test_process_loader_detects_dead_worker_promptly():
    """A killed worker (OOM analogue) must surface within the 5 s liveness
    poll, not after the full 600 s result timeout (torch DataLoader
    semantics)."""
    import os
    import signal
    import threading
    import time

    loader = _Loader(
        _SlowTail(length=8, patch_height=32),
        batch_size=4,
        shuffle=False,
        num_workers=1,
        prefetch=0,
        worker_type="process",
    )
    it = loader()
    next(it)  # first batch arrives; worker now sleeps in batch 2

    def kill_soon():
        time.sleep(1.0)
        os.kill(loader._pool.procs[0].pid, signal.SIGKILL)

    threading.Thread(target=kill_soon, daemon=True).start()
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="died without a result"):
        next(it)
    assert time.monotonic() - t0 < 30.0
    loader.shutdown()


def test_worker_type_validated():
    with pytest.raises(ValueError, match="thread|process"):
        _Loader(SyntheticPatchTrain(length=4), batch_size=2, shuffle=False, worker_type="gpu")


def test_process_loader_nuscenes_native_ops(tmp_path):
    """Spawn workers must re-load the native ctypes libs (module-global,
    lazily bound — never pickled with the dataset) and produce batches
    identical to the in-process path over the real nuScenes item pipeline."""
    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    from test_data import _fake_infos

    root = _fake_infos(tmp_path)
    kw = dict(
        data_root=str(root),
        label_names=["car", "background"],
        patch_height=64,
        negative_sample_prob=0.0,
        seed=0,
    )
    inline = _Loader(NuScenesTrain(**kw), batch_size=4, shuffle=False, num_workers=0)
    proc = _Loader(
        NuScenesTrain(**kw), batch_size=4, shuffle=False,
        num_workers=2, worker_type="process",
    )
    ref, got = list(inline()), list(proc())
    proc.shutdown()
    assert len(got) == len(ref) > 0
    for rb, gb in zip(ref, got):
        np.testing.assert_array_equal(rb["patch"], gb["patch"])
        np.testing.assert_array_equal(rb["pose_6d"], gb["pose_6d"])
