#!/usr/bin/env python
"""Compare one full train step between the Pallas and XLA kernel paths on the
local TPU (same state, same rngs). Run when the remote Pallas compile service
is healthy (it oscillates; see docs/BENCH.md) — the Pallas leg retries up to
6 times. Expected: relative differences ~1e-3 or less on every logged metric.
"""

import sys, os; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

from generative_detection_tpu.utils.runtime import enable_persistent_cache

enable_persistent_cache()

def run(pallas):
    os.environ["GDT_USE_PALLAS"] = pallas
    # fresh process would be cleaner; emulate by clearing caches
    import jax
    jax.clear_caches()
    import generative_detection_tpu.ops.dispatch as d
    d._PALLAS_OK = None
    from generative_detection_tpu.config import load_yaml, instantiate_from_config
    from generative_detection_tpu.train import create_train_state, make_optimizers, make_train_step
    from generative_detection_tpu.parallel import create_mesh, shard_batch
    cfg = load_yaml("configs/autoencoder/pose/autoencoder_kl_16x16x16.yaml")
    cfg["model"]["params"]["lossconfig"]["params"]["dataset_stats_path"] = None
    # 128x128 inputs: same kernel families exercised (flash attention at
    # 32^2=1024 tokens, Pallas GroupNorm at eligible shapes) at ~1/4 the
    # compile+run cost — the full-size compile through the remote service
    # takes tens of minutes per leg on this host.
    size = int(os.environ.get("GDT_COMPARE_SIZE", "128"))
    cfg["model"]["params"]["input_size"] = size
    cfg["model"]["params"]["dtype"] = "bfloat16"
    if size != 256:
        # keep the 16x16 latent the pose pathway requires: drop one
        # downsample level per halving of the input size
        import math
        levels = int(math.log2(size // 16)) + 1
        cfg["model"]["params"]["ddconfig"]["ch_mult"] = ([1, 1, 2, 2, 4])[-levels:]
        cfg["model"]["params"]["ddconfig"]["resolution"] = size
    model = instantiate_from_config(cfg["model"])
    model.learning_rate = 2.16e-4
    opt_ae, opt_disc = make_optimizers(model.learning_rate)
    mesh = create_mesh()
    bs = 4
    rng = np.random.default_rng(0)
    b = model.example_batch(bs)
    b["patch"] = rng.uniform(0,1,size=(bs,size,size,3)).astype(np.float32)
    cls = np.resize(np.asarray([0,2,10,5],np.int32), bs); b["class_id"]=cls; b["original_class_id"]=cls
    with mesh:
        state = create_train_state(
            model, jax.random.PRNGKey(0), bs, opt_ae, opt_disc, mesh=mesh
        )
        from generative_detection_tpu.parallel import replicated_scalar
        state = state.replace(step=replicated_scalar(40000, mesh, "int32"))
        fn = jax.jit(make_train_step(model, opt_ae, opt_disc, phase="full"))
        prep = shard_batch(model.prepare_batch(b), mesh)
        _, m = fn(state, prep)
    return {k: float(np.asarray(v)) for k, v in m.items()}

m0 = run("0")
import time
m1 = None
for _attempt in range(6):
    try:
        m1 = run("1"); break
    except Exception as e:
        print("pallas attempt", _attempt, "failed:", str(e).splitlines()[0][:90]); time.sleep(20)
assert m1 is not None, "pallas leg never compiled"
for k in ["aeloss", "discloss", "train/rec_loss", "train/nll_loss", "train/g_loss", "train/kl_loss_obj", "train/pose_loss", "train/d_weight"]:
    a, b2 = m0[k], m1[k]
    rel = abs(a-b2)/max(abs(a), 1e-6)
    print(f"{k}: xla={a:.6g} pallas={b2:.6g} rel={rel:.2e}")
