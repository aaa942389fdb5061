"""Multi-host (multi-process) integration tests.

The reference distributes via SLURM srun + Lightning DDP (ref README.md:58,
train.py:162,477). The TPU-native analogue is jax.distributed + one data
shard per process + host-0 I/O gating; these tests run a REAL 2-process
jax.distributed CPU cluster via subprocesses (Gloo collectives) and check
the loader-side sharding logic in-process.
"""

import os
import re
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_train_step(tmp_path):
    """Two processes, 4 global devices, fused train step over the global
    mesh with per-process batch shards: identical finite global losses on
    both ranks, checkpoint written by rank 0 only."""
    workers = []
    port = 12923
    for pid in range(2):
        wd = tmp_path / f"rank{pid}"
        wd.mkdir()
        env = {
            k: v
            for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        workers.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.join(ROOT, "tests", "multihost_worker.py"),
                    str(pid),
                    "2",
                    str(port),
                    str(wd),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for pid, p in enumerate(workers):
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"rank {pid} failed:\n{err[-3000:]}"
        outs.append(out)

    losses = []
    for pid, out in enumerate(outs):
        m = re.search(r"MHOK pid=%d main=(\w+) losses=(\S+)" % pid, out)
        assert m, out[-1000:]
        assert m.group(1) == ("True" if pid == 0 else "False")
        vals = [float(x) for pair in m.group(2).split(";") for x in pair.split(",")]
        assert all(np.isfinite(v) for v in vals), vals
        losses.append(vals)
    # both ranks observed the SAME global losses (grad psum consistency)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # one coherent checkpoint in the SHARED dir (orbax collective save:
    # every process calls, the primary host writes)
    last = os.path.join(tmp_path, "shared_ckpt", "last")
    assert os.path.isdir(last) and [d for d in os.listdir(last) if d.isdigit()]
    # non-orbax artifacts are host-0-only
    assert os.path.exists(tmp_path / "rank0" / "metrics.jsonl")
    assert not os.path.exists(tmp_path / "rank1" / "metrics.jsonl")


def test_loader_sharding_disjoint_and_complete():
    """_Loader(shard_id, num_shards): per-process batches are disjoint and
    cover the dataset (the DistributedSampler analogue)."""
    from generative_detection_tpu.data.datamodule import _Loader

    class D:  # _Loader collates dicts; wrap plain ints
        def __len__(self):
            return 37

        def __getitem__(self, i):
            return {"v": np.asarray(i)}

    seen = []
    for shard in range(3):
        loader = _Loader(
            D(), batch_size=2, shuffle=True, num_workers=0, seed=7,
            shard_id=shard, num_shards=3,
        )
        items = [int(v) for batch in loader() for v in batch["v"]]
        seen.append(set(items))
        assert len(items) == len(set(items))
    assert seen[0] & seen[1] == set()
    assert seen[0] & seen[2] == set()
    assert seen[1] & seen[2] == set()
    # full coverage modulo drop_last (batch_size 2, 12/13 per shard)
    assert len(seen[0] | seen[1] | seen[2]) >= 36

    # per-shard length accounting
    l0 = _Loader(D(), batch_size=2, shuffle=False, shard_id=0, num_shards=3)
    assert l0._local_len() == 13 and len(l0) == 6
