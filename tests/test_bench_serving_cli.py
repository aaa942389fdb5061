"""Fresh-subprocess smoke of tools/bench_serving.py (the serving-latency
surface for the deployment path the reference promises, ref README.md:63-66).

Overrides ``ddconfig.resolution`` so it differs from ``input_size`` — the
flagship recipe's configuration (resolution=64 steers attention placement
while 256^2 patches are fed), which a size derivation from ddconfig gets
wrong (regression: bench_serving built 64^2 detector inputs against params
initialized at 256^2).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_serving_tiny_input_size_differs_from_resolution(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gdt_jax_cache")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools/bench_serving.py"),
            "--tiny",
            "--recon",
            "--batches",
            "2",
            "--steps",
            "2",
            "model.params.ddconfig.resolution=16",
        ],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "serving_latency"
    assert out["model_resolution"] == 32  # input_size, not ddconfig.resolution
    assert out["in_process"][0]["batch"] == 2
    assert out["in_process"][0]["p50_ms"] > 0
    assert out["exported"]["artifact_bytes"] > 0
    assert out["recon"][0]["patches_per_s"] > 0
