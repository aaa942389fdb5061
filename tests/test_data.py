"""Data pipeline tests: native ops vs PIL, nuScenes reader on a fake info-pkl."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from generative_detection_tpu.data import native


@pytest.fixture(scope="module")
def native_lib():
    lib = native.load_lib()
    if lib is None:
        pytest.skip("native patchops unavailable")
    return lib


def test_native_crop_resize_matches_pil(native_lib, rng):
    img = rng.integers(0, 255, size=(100, 120, 3)).astype(np.uint8)
    out = native.crop_resize_bilinear(img, 10, 20, 64, 32, 32)
    pil = Image.fromarray(img).crop((10, 20, 74, 84)).resize(
        (32, 32), resample=Image.Resampling.BILINEAR
    )
    want = np.asarray(pil, np.float32) / 255.0
    assert np.abs(out - want).mean() < 0.02


def test_native_crop_out_of_bounds_zero_pads(native_lib, rng):
    img = np.full((50, 50, 3), 200, np.uint8)
    out = native.crop_resize_bilinear(img, -25, -25, 50, 50, 50)
    # top-left quadrant is mostly outside -> zeros
    assert out[:20, :20].max() < 0.1
    assert out[30:, 30:].mean() > 0.5


def test_native_mask(native_lib):
    mask = native.bbox_mask(64, (16, 16, 48, 48), 32, 32)
    assert mask.shape == (32, 32)
    assert mask[16, 16] == 1.0
    assert mask[0, 0] == 0.0
    assert 0.2 < mask.mean() < 0.3  # ~quarter of the area


def test_native_max_iou(native_lib):
    box = np.asarray([0, 0, 10, 10], np.float32)
    boxes = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    got = native.max_iou(box, boxes)
    assert got == pytest.approx(1.0)


def _fake_infos(tmp_path, n_samples=3, smooth=False):
    """Minimal mmdet3d-style nuscenes info pkl + camera JPEGs.

    smooth=True renders band-limited gradients instead of per-pixel noise —
    needed when comparing resampling filters (point-bilinear vs triangle
    legitimately diverge on white noise)."""
    rng = np.random.default_rng(5)
    cam = "CAM_FRONT"
    os.makedirs(tmp_path / "samples" / cam, exist_ok=True)
    data_list = []
    for s in range(n_samples):
        fname = f"img_{s}.jpg"
        if smooth:
            yy, xx = np.mgrid[0:900, 0:1600].astype(np.float32)
            img = np.stack(
                [
                    127 + 100 * np.sin(xx / 97.0 + s) * np.cos(yy / 83.0),
                    127 + 100 * np.cos(xx / 61.0) * np.sin(yy / 127.0 + s),
                    (xx + yy) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
        else:
            img = (rng.uniform(0, 255, size=(900, 1600, 3))).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "samples" / cam / fname)
        cam2img = [[1266.0, 0.0, 800.0], [0.0, 1266.0, 450.0], [0.0, 0.0, 1.0]]
        inst = {
            "bbox": [700.0, 380.0, 900.0, 520.0],
            "bbox_label": 0,  # car
            "bbox_3d": [1.2, 0.8, 20.0, 4.0, 1.6, 1.9, 0.4],
            "center_2d": [800.0, 450.0],
        }
        images = {
            c: {"img_path": f"nonexistent/{fname}", "cam2img": cam2img}
            for c in [
                "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
            ]
        }
        images[cam]["img_path"] = f"whatever/{fname}"
        data_list.append(
            {
                "sample_idx": s,
                "images": images,
                "cam_instances": {c: ([inst] if c == cam else []) for c in images},
            }
        )
    with open(tmp_path / "nuscenes_infos_train.pkl", "wb") as f:
        pickle.dump({"metainfo": {}, "data_list": data_list}, f)
    return tmp_path


def test_nuscenes_reader_object_items(tmp_path):
    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    root = _fake_infos(tmp_path)
    ds = NuScenesTrain(
        data_root=str(root),
        label_names=["car", "background"],
        patch_height=64,
        negative_sample_prob=0.0,  # force object branch
        seed=0,
        pipeline=[],  # ignored mmdet3d kwargs accepted
        box_type_3d="Camera",
    )
    assert len(ds) == 3 * 6
    item = ds[0]
    assert item["patch"].shape == (64, 64, 3)
    assert item["class_name"] == "car"
    assert item["pose_6d"].shape == (4,)
    assert np.all(np.isfinite(item["pose_6d"]))
    assert item["bbox_sizes"] == pytest.approx([4.0 / 1.6, 1.6, 1.9 / 1.6])
    assert 0.0 <= item["fill_factor"] < 1.0
    assert item["mask_2d_bbox"].max() == 1.0


def test_nuscenes_reader_background_items(tmp_path):
    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    root = _fake_infos(tmp_path)
    ds = NuScenesTrain(
        data_root=str(root),
        label_names=["car", "background"],
        patch_height=64,
        negative_sample_prob=1.0,  # force background branch
        seed=0,
    )
    item = ds[1]
    assert item["class_name"] == "background"
    assert np.all(item["pose_6d"] == 0)
    assert item["mask_2d_bbox"].max() == 0.0


def test_nuscenes_skip_forward_on_empty_cameras(tmp_path):
    # cameras 1..5 have no instances; with negative_sample_prob=0 the reader
    # must skip forward to the next index with instances instead of failing
    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    root = _fake_infos(tmp_path)
    ds = NuScenesTrain(
        data_root=str(root),
        label_names=["car", "background"],
        patch_height=64,
        negative_sample_prob=0.0,
        seed=0,
    )
    item = ds[1]  # CAM_FRONT_RIGHT has no instances -> skips forward
    assert item["class_name"] == "car"


def test_pose_label_yaw_roundtrip():
    # synthetic labels: v3 of the SE(3) log should equal -yaw for pure yaw
    from generative_detection_tpu.data.synthetic import pose_labels_from_box

    pose, sizes, yaw = pose_labels_from_box(
        1.0, 0.5, 20.0, 4.0, 1.6, 1.9, 0.7,
        patch_center=(850.0, 470.0), patch_size_pixels=100.0,
        patch_resampling_factor=2.56, fill_factor=0.1, hmin=0.5, hmax=4.0,
    )
    assert pose.shape == (4,)
    np.testing.assert_allclose(pose[3], -0.7, atol=1e-4)
    np.testing.assert_allclose(sizes, [2.5, 1.6, 1.1875], rtol=1e-5)


def test_device_preprocess_pipeline(tmp_path):
    """device_preprocess=True: the host ships raw uint8 crops + mask rects;
    prepare_batch finishes resize/normalize/mask on-device inside jit (the
    BASELINE "jit preprocessing" stage). The mask must match the host C++
    rasterizer exactly; RGB agrees up to resampling-filter differences
    (device = point bilinear, host = triangle filter)."""
    from generative_detection_tpu.data.nuscenes import NuScenesTrain
    from generative_detection_tpu.data.datamodule import collate

    root = _fake_infos(tmp_path, smooth=True)
    kw = dict(
        data_root=str(root),
        label_names=["car", "background"],
        patch_height=64,
        negative_sample_prob=0.0,
        seed=0,
    )
    ds_dev = NuScenesTrain(device_preprocess=True, **kw)
    ds_host = NuScenesTrain(**kw)

    item = ds_dev[0]
    assert item["patch_raw"].dtype == np.uint8
    assert item["patch_raw"].shape == (400, 400, 3)
    assert "patch" not in item and "mask_2d_bbox" not in item
    assert item["patch_src_size"] > 0

    batch = collate([ds_dev[i] for i in (0, 6)])  # two different samples
    host_items = [ds_host[i] for i in (0, 6)]

    import jax
    from generative_detection_tpu.config import load_yaml, instantiate_from_config

    cfg = load_yaml("configs/autoencoder/pose/tiny_cpu.yaml")
    model = instantiate_from_config(cfg["model"])
    prepared = model.prepare_batch(batch)
    assert prepared["rgb_gt"].shape == (2, 64, 64, 3)
    assert prepared["mask_2d_bbox"].shape == (2, 64, 64, 1)

    # mask: exact vs the host rasterizer (same floor((i+.5)*scale) formula)
    got_mask = np.asarray(prepared["mask_2d_bbox"])
    want_mask = np.stack([it["mask_2d_bbox"] for it in host_items])
    np.testing.assert_array_equal(got_mask, want_mask)

    # rgb: [-1, 1] and close to the host path up to filter differences
    rgb = np.asarray(prepared["rgb_gt"])
    assert rgb.min() >= -1.0 - 1e-5 and rgb.max() <= 1.0 + 1e-5
    from generative_detection_tpu.models.autoencoder import rescale_minmax
    import jax.numpy as jnp

    want_rgb = np.asarray(
        rescale_minmax(jnp.asarray(np.stack([it["patch"] for it in host_items])))
    )
    assert np.abs(rgb - want_rgb).mean() < 0.08


def test_device_preprocess_background_branch(tmp_path):
    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    root = _fake_infos(tmp_path)
    ds = NuScenesTrain(
        data_root=str(root),
        label_names=["car", "background"],
        patch_height=64,
        negative_sample_prob=1.0,  # force background branch
        seed=0,
        device_preprocess=True,
    )
    item = ds[0]
    assert item["class_name"] == "background"
    assert item["patch_raw"].shape == (400, 400, 3)
    np.testing.assert_array_equal(item["bbox_in_crop"], np.zeros(4, np.float32))


def test_device_bbox_mask_matches_native(rng):
    """ops.resize.bbox_mask mirrors native/patchops.cpp::bbox_mask_resize."""
    from generative_detection_tpu.data import native as native_mod
    from generative_detection_tpu.ops import bbox_mask
    import jax.numpy as jnp

    lib = native_mod.load_lib()
    if lib is None:
        pytest.skip("native patchops unavailable")
    cases = [
        (64, (16.0, 16.0, 48.0, 48.0)),
        (100, (-10.0, 5.5, 60.0, 99.0)),
        (37, (0.0, 0.0, 37.0, 37.0)),
    ]
    sizes = np.asarray([c[0] for c in cases], np.float32)
    rects = np.asarray([c[1] for c in cases], np.float32)
    got = np.asarray(bbox_mask(jnp.asarray(rects), jnp.asarray(sizes), 32))
    for i, (size, rect) in enumerate(cases):
        want = native_mod.bbox_mask(size, rect, 32, 32)[..., None]
        np.testing.assert_array_equal(got[i], want)


def _write_pkl(path, obj):
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def test_info_pkl_schema_variants(tmp_path):
    """Reader accepts the mmdet3d v1.1+ layouts (dict-with-data_list and
    bare list) and rejects pre-1.1 / unknown layouts with loud, actionable
    errors (VERDICT: never silently mis-read a schema variant)."""
    from generative_detection_tpu.data.nuscenes import NuScenesTrain

    root = _fake_infos(tmp_path)  # standard {'metainfo','data_list'}
    kw = dict(
        data_root=str(root), label_names=["car", "background"],
        patch_height=64, negative_sample_prob=0.0, seed=0,
    )
    ds = NuScenesTrain(**kw)
    with open(tmp_path / "nuscenes_infos_train.pkl", "rb") as f:
        std = pickle.load(f)

    # bare-list export of the same entries: accepted, same length
    _write_pkl(tmp_path / "nuscenes_infos_train.pkl", std["data_list"])
    assert len(NuScenesTrain(**kw)) == len(ds)

    # pre-1.1 layout -> loud, actionable
    _write_pkl(tmp_path / "nuscenes_infos_train.pkl", {"infos": [], "metadata": {}})
    with pytest.raises(ValueError, match="pre-1.1"):
        NuScenesTrain(**kw)

    # unknown dict layout
    _write_pkl(tmp_path / "nuscenes_infos_train.pkl", {"something": 1})
    with pytest.raises(ValueError, match="unrecognized"):
        NuScenesTrain(**kw)

    # entries missing the camera table (e.g. lidar-only export)
    _write_pkl(
        tmp_path / "nuscenes_infos_train.pkl",
        {"metainfo": {}, "data_list": [{"lidar_points": {}, "token": "x"}]},
    )
    with pytest.raises(ValueError, match="images"):
        NuScenesTrain(**kw)

    # entries missing cam_instances (box-less export)
    _write_pkl(
        tmp_path / "nuscenes_infos_train.pkl",
        {"metainfo": {}, "data_list": [{"images": {"CAM_FRONT": {}}}]},
    )
    with pytest.raises(ValueError, match="cam_instances"):
        NuScenesTrain(**kw)

    # not a pickle-of-dict/list at all
    _write_pkl(tmp_path / "nuscenes_infos_train.pkl", 42)
    with pytest.raises(ValueError, match="expected a dict or list"):
        NuScenesTrain(**kw)


def test_validate_nuscenes_preflight_tool(tmp_path):
    """tools/validate_nuscenes.py runs every preflight stage against the
    fake info-pkl fixture and reports ok + per-stage timings."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from validate_nuscenes import validate

    root = _fake_infos(tmp_path, n_samples=3)
    report = validate(str(root), check_images=2, items=6)
    assert report["ok"], report["errors"]
    assert report["stages"]["pkl"]["samples"] == 3
    assert report["stages"]["images"]["checked"] > 0
    assert report["stages"]["items"]["ran"] == 6
    assert report["stages"]["items"]["failed"] == 0
    assert report["stages"]["items"]["mean_ms"] is not None
    # default h-minmax fallback is a warning, not an error
    assert any("h-min/max" in w for w in report["warnings"])

    # a wrong data_root fails fast with an actionable error
    bad = validate(str(tmp_path / "nope"), check_images=2, items=2)
    assert not bad["ok"] and any("not found" in e for e in bad["errors"])

    # device-preprocess contract also dry-runs
    rep2 = validate(str(root), check_images=1, items=4, device_preprocess=True)
    assert rep2["ok"], rep2["errors"]


class _IterableRecords:
    """Iterable-style dataset (no __getitem__/__len__): the protocol of the
    reference's Txt2ImgIterableBaseDataset branch (ref
    data_modules.py:9,100-104)."""

    def __init__(self, n):
        self.n = n

    def __iter__(self):
        for i in range(self.n):
            yield {"x": np.full((2, 2), i, dtype=np.float32), "idx": i}


def test_loader_iterable_dataset():
    """_Loader consumes an iterable dataset: in-order batches, shuffle
    ignored (ref forces shuffle=False for iterables, data_modules.py:102),
    drop_last semantics, and len() raises (torch IterableDataset)."""
    from generative_detection_tpu.data.datamodule import _Loader

    ds = _IterableRecords(10)
    loader = _Loader(ds, batch_size=4, shuffle=True, num_workers=0)
    with pytest.raises(TypeError):
        len(loader)
    batches = list(loader())
    assert [b["idx"].tolist() for b in batches] == [[0, 1, 2, 3], [4, 5, 6, 7]]

    # drop_last=False emits the short tail batch
    loader2 = _Loader(ds, batch_size=4, shuffle=False, num_workers=0, drop_last=False)
    batches2 = list(loader2())
    assert [b["idx"].tolist() for b in batches2] == [
        [0, 1, 2, 3], [4, 5, 6, 7], [8, 9],
    ]

    # prefetch-thread path produces the identical sequence
    loader3 = _Loader(ds, batch_size=4, shuffle=False, num_workers=2)
    assert [b["idx"].tolist() for b in loader3()] == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_loader_iterable_multihost_shards_disjoint():
    """Multi-host sharding strides the item stream: shards are disjoint and
    together cover every record once (the coverage the reference's
    worker_init_fn achieves by splitting sample_ids, ref data_modules.py:19-24)."""
    from generative_detection_tpu.data.datamodule import _Loader

    seen = []
    for shard in range(2):
        loader = _Loader(
            _IterableRecords(8), batch_size=2, shuffle=False,
            num_workers=0, shard_id=shard, num_shards=2,
        )
        for b in loader():
            seen.extend(b["idx"].tolist())
    assert sorted(seen) == list(range(8))


def test_datamodule_iterable_end_to_end():
    """DataModuleFromConfig serves an iterable dataset through
    train_dataloader unchanged (config-driven instantiation)."""
    from generative_detection_tpu.data.datamodule import DataModuleFromConfig

    dm = DataModuleFromConfig(
        batch_size=3,
        train={
            "target": "tests.test_data._IterableRecords",
            "params": {"n": 9},
        },
        num_workers=0,
    )
    dm.setup()
    batches = list(dm.train_dataloader())
    assert len(batches) == 3
    assert batches[0]["x"].shape == (3, 2, 2)
