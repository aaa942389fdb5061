"""Offline stats tools: streaming moments + hmin/hmax derivation."""

import math
import pickle
import subprocess
import sys

import numpy as np

from compute_dataset_stats import RunningMoments, item_values


def test_running_moments_match_numpy(rng):
    xs = rng.normal(loc=2.0, scale=3.0, size=500)
    m = RunningMoments()
    for x in xs:
        m.update(float(x))
    np.testing.assert_allclose(m.mean, xs.mean(), rtol=1e-6)
    np.testing.assert_allclose(m.var, xs.var(), rtol=1e-3)
    np.testing.assert_allclose(m.logvar, math.log(xs.var()), rtol=1e-3)


def test_item_values_keys():
    item = {
        "pose_6d": np.asarray([0.1, 0.2, 0.3, 0.4], np.float32),
        "bbox_sizes": np.asarray([2.5, 1.6, 1.2], np.float32),
        "yaw": 0.7,
        "fill_factor": 0.1,
    }
    vals = item_values(item)
    assert set(vals) == {"t1", "t2", "t3", "v3", "l", "h", "w", "yaw", "fill_factor"}
    assert vals["h"] == np.float32(1.6)


def test_stats_pipeline_end_to_end(tmp_path):
    """compute_dataset_stats on the synthetic dataset -> all.pkl consumed by
    build_prior_tables; compute_hmin_hmax -> hmin/hmax pkls."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
data:
  params:
    train:
      target: generative_detection_tpu.data.synthetic.SyntheticPatchTrain
      params: {length: 24, patch_height: 32, negative_sample_prob: 0.3}
"""
    )
    out = tmp_path / "stats"
    r = subprocess.run(
        [sys.executable, "compute_dataset_stats.py", "-b", str(cfg), "--out", str(out), "--limit", "24"],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    all_pkl = out / "combined" / "all.pkl"
    assert all_pkl.exists()
    with open(all_pkl, "rb") as f:
        stats = pickle.load(f)
    assert stats, "no classes collected"
    some_label = next(iter(stats))
    assert "h" in stats[some_label]

    from generative_detection_tpu.losses.contperceptual import build_prior_tables

    means, logvars = build_prior_tables(str(all_pkl), train_on_yaw=True)
    assert len(means) == 11

    r2 = subprocess.run(
        [sys.executable, "compute_hmin_hmax.py", "--stats_dir", str(out / "combined")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    with open(out / "combined" / "hmin.pkl", "rb") as f:
        hmin = pickle.load(f)
    with open(out / "combined" / "hmax.pkl", "rb") as f:
        hmax = pickle.load(f)
    for label in hmin:
        assert hmax[label] > hmin[label]
