"""Set-based frame-level detection metrics (eval/detection.py)."""

import numpy as np
import pytest

from generative_detection_tpu.eval.detection import (
    _average_precision,
    evaluate_detections,
)


def _box(frame, cname, x, z, size=(4.0, 1.9, 1.6), yaw=0.0, score=None):
    d = {
        "frame": frame,
        "class_name": cname,
        "center": np.asarray([x, z], np.float32),
        "size": np.asarray(size, np.float32),
        "yaw": float(yaw),
    }
    if score is not None:
        d["score"] = float(score)
    return d


def test_perfect_predictions_score_one():
    gts, preds = [], []
    for f in range(3):
        for i in range(2):
            gts.append(_box(f, "car", 5.0 * i, 20.0 + f))
            preds.append(_box(f, "car", 5.0 * i, 20.0 + f, score=0.9 - 0.1 * i))
    res = evaluate_detections(preds, gts, ["car"])
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6)
    assert res["mATE"] == pytest.approx(0.0, abs=1e-6)
    assert res["mASE"] == pytest.approx(0.0, abs=1e-6)
    assert res["mAOE"] == pytest.approx(0.0, abs=1e-6)
    assert res["nds3"] == pytest.approx(1.0, abs=1e-6)


def test_ranking_quality_drives_ap():
    gts = [_box(0, "car", 0.0, 20.0)]
    # an FP OUTRANKING the TP costs precision at full recall
    preds = [
        _box(0, "car", 50.0, 50.0, score=0.9),  # confident far FP
        _box(0, "car", 0.0, 20.0, score=0.8),   # TP, ranked second
    ]
    res = evaluate_detections(preds, gts, ["car"])
    # operating points (r, p) = (0, 0) -> (1, 0.5); linear interp then the
    # sub-10% clip gives mean_{r in [0.11, 1]} max(0, 0.5 r - 0.1) / 0.9 = 0.2
    assert res["AP/car"] == pytest.approx(0.2, abs=5e-3)

    # a duplicate match counts as FP (greedy: GT already taken) but a
    # TRAILING duplicate after full recall barely moves AP
    preds2 = [
        _box(0, "car", 0.0, 20.0, score=0.9),
        _box(0, "car", 0.1, 20.0, score=0.8),
    ]
    res2 = evaluate_detections(preds2, gts, ["car"])
    assert res2["AP/car"] > 0.9


def test_misses_cap_recall():
    gts = [_box(0, "car", 0.0, 20.0), _box(0, "car", 30.0, 20.0)]
    preds = [_box(0, "car", 0.0, 20.0, score=0.9)]  # one of two found
    res = evaluate_detections(preds, gts, ["car"])
    # recall plateaus at 0.5 -> AP well below 1
    assert res["mAP"] < 0.6


def test_classes_without_gt_excluded():
    gts = [_box(0, "car", 0.0, 20.0)]
    preds = [
        _box(0, "car", 0.0, 20.0, score=0.9),
        _box(0, "truck", 5.0, 20.0, score=0.9),  # no truck GT anywhere
    ]
    res = evaluate_detections(preds, gts, ["car", "truck"])
    assert "AP/truck" not in res
    assert res["mAP"] == pytest.approx(res["AP/car"])


def test_tp_errors_reflect_offsets():
    gts = [_box(0, "car", 0.0, 20.0, size=(4.0, 2.0, 2.0), yaw=0.0)]
    preds = [_box(0, "car", 1.0, 20.0, size=(2.0, 2.0, 2.0), yaw=0.5, score=0.9)]
    res = evaluate_detections(preds, gts, ["car"])
    assert res["ATE/car"] == pytest.approx(1.0, abs=1e-6)
    # aligned IoU = (2*2*2)/(4*2*2 + 8 - 8) = 0.5 -> ASE 0.5
    assert res["ASE/car"] == pytest.approx(0.5, abs=1e-6)
    assert res["AOE/car"] == pytest.approx(0.5, abs=1e-6)


def test_barrier_yaw_period_pi():
    gts = [_box(0, "barrier", 0.0, 20.0, yaw=0.0)]
    preds = [_box(0, "barrier", 0.0, 20.0, yaw=np.pi, score=0.9)]
    res = evaluate_detections(preds, gts, ["barrier"])
    assert res["AOE/barrier"] == pytest.approx(0.0, abs=1e-6)  # pi-symmetric


def test_matching_is_per_frame():
    gts = [_box(0, "car", 0.0, 20.0)]
    preds = [_box(1, "car", 0.0, 20.0, score=0.9)]  # right place, wrong frame
    res = evaluate_detections(preds, gts, ["car"])
    assert res["mAP"] == pytest.approx(0.0, abs=1e-6)


def test_average_precision_formula():
    # all TP, 1 GT each: precision 1 everywhere -> AP = 1 after clipping
    assert _average_precision(np.asarray([True]), 1) == pytest.approx(1.0)
    # no predictions
    assert _average_precision(np.asarray([], bool), 3) == 0.0
    # single FP
    assert _average_precision(np.asarray([False]), 1) == 0.0


def test_tp_errors_use_recall_sampled_cummean():
    """nuScenes calc_tp: errors accumulate as cumulative means in confidence
    order over recall samples — accurate high-confidence matches weigh more
    than sloppy low-confidence ones (a plain match mean would score 0.5)."""
    gts = [_box(0, "car", 10.0 * i, 20.0) for i in range(10)]
    preds = []
    for i in range(10):
        # first 5 (high score): perfect; last 5 (low score): 1 m off
        off = 0.0 if i < 5 else 1.0
        preds.append(_box(0, "car", 10.0 * i + off, 20.0, score=0.9 - 0.05 * i))
    res = evaluate_detections(preds, gts, ["car"])
    # cumulative mean rises from 0 toward 0.5 only over the later recall
    # samples; the sampled average must sit strictly below the plain mean
    assert 0.0 < res["ATE/car"] < 0.5


def test_tp_error_is_one_below_min_recall():
    """A class whose recall never reaches min_recall (10%) scores the
    maximal TP error 1.0 even if its few matches are perfect."""
    gts = [_box(0, "car", 10.0 * i, 20.0) for i in range(20)]
    preds = [_box(0, "car", 0.0, 20.0, score=0.9)]  # 1/20 = 5% recall
    res = evaluate_detections(preds, gts, ["car"])
    assert res["ATE/car"] == pytest.approx(1.0)
    assert res["ASE/car"] == pytest.approx(1.0)
    assert res["AOE/car"] == pytest.approx(1.0)


def test_frame_ids_from_batch_groups_real_frames():
    """Patches from the same (sample_idx, cam_idx) share a frame id; the
    set-based evaluator then lets them COMPETE in matching (multi-object
    frames), while datasets without frame identity get the -1 sentinel."""
    from generative_detection_tpu.eval import evaluate_detections, frame_ids_from_batch

    batch = {
        "sample_idx": np.asarray([3, 3, 3, 7]),
        "cam_idx": np.asarray([0, 0, 1, 0]),
        "patch": np.zeros((4, 8, 8, 3)),
    }
    fids = frame_ids_from_batch(batch, 4)
    assert fids[0] == fids[1]  # same camera frame
    assert fids[0] != fids[2]  # same sample, different camera
    assert fids[2] != fids[3]
    # no identity -> sentinel
    assert (frame_ids_from_batch({"patch": batch["patch"]}, 4) == -1).all()

    # multi-object frame: two GTs + two predictions in ONE frame, where the
    # second prediction lands on the first GT's location — per-frame greedy
    # matching must mark it FP (GT taken), which per-patch pseudo-frames
    # could never express
    f = int(fids[0])
    gts = [_box(f, "car", 0.0, 20.0), _box(f, "car", 30.0, 20.0)]
    preds = [
        _box(f, "car", 0.0, 20.0, score=0.9),
        _box(f, "car", 0.3, 20.0, score=0.8),  # duplicate on taken GT -> FP
    ]
    res = evaluate_detections(preds, gts, ["car"])
    assert res["mAP"] < 0.6  # recall capped at 0.5 + an FP
