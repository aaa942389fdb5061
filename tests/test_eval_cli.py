"""End-to-end tests of the eval.py CLI (the surface promised by ref
README.md:63-66): data-parallel inference over an 8-device virtual mesh and
the ``device_preprocess: true`` raw-crop image contract (VERDICT r2 #3).

Run as fresh subprocesses so the virtual CPU mesh provisioning
(``xla_force_host_platform_device_count``) matches driver/CI conditions.
"""

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_eval(tmp_path, extra_args, n_devices=8):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices} "
        + os.environ.get("XLA_FLAGS", "")
    ).strip()
    # keep CPU test compiles out of the in-repo (TPU-warmed) cache
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gdt_jax_cache")
    out_json = str(tmp_path / "metrics.json")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "eval.py"),
            "-b",
            os.path.join(ROOT, "configs/autoencoder/pose/tiny_cpu.yaml"),
            "--limit",
            "2",
            "--out",
            out_json,
            "lightning.trainer.accelerator=cpu",
        ]
        + extra_args,
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out_json) as f:
        return json.load(f), proc


def test_eval_cli_virtual_mesh(tmp_path):
    """tiny_cpu batch_size=8 divides the 8-device mesh: eval shards the
    batch over all devices and reports finite recon + detection metrics."""
    results, _ = _run_eval(tmp_path, [])
    assert np.isfinite(results["psnr"])
    assert np.isfinite(results["kl"])
    # per-patch and set-based families both present
    assert any(k.startswith("set/") for k in results)


def test_eval_cli_device_preprocess(tmp_path):
    """`device_preprocess: true` datasets ship raw uint8 crops (`patch_raw`);
    eval must route through model.prepare_batch instead of batch['patch']
    (the round-2 crash: eval.py read batch['patch'] directly)."""
    results, _ = _run_eval(
        tmp_path,
        [
            "data.params.validation.params.device_preprocess=true",
        ],
    )
    assert np.isfinite(results["psnr"])
    assert np.isfinite(results["kl"])


def test_eval_cli_sharded_matches_single_device(tmp_path):
    """Data-parallel inference must be numerically consistent: the same
    eval on an 8-device virtual mesh and on one device reports the same
    reconstruction metrics (the jit computes global batch statistics via
    collectives when sharded)."""
    (tmp_path / "d8").mkdir()
    (tmp_path / "d1").mkdir()
    res8, _ = _run_eval(tmp_path / "d8", [], n_devices=8)
    res1, _ = _run_eval(tmp_path / "d1", [], n_devices=1)
    assert abs(res8["psnr"] - res1["psnr"]) < 1e-3 * max(abs(res1["psnr"]), 1)
    assert abs(res8["kl"] - res1["kl"]) < 1e-3 * max(abs(res1["kl"]), 1)
