import textwrap

import pytest

from generative_detection_tpu.config import (
    apply_dotlist,
    deep_merge,
    instantiate_from_config,
    merge_configs,
)
from generative_detection_tpu.config.instantiate import resolve_target


def test_deep_merge_nested():
    a = {"model": {"params": {"lr": 1.0, "keep": 2}}, "x": 1}
    b = {"model": {"params": {"lr": 5.0}}, "y": 3}
    out = deep_merge(a, b)
    assert out["model"]["params"] == {"lr": 5.0, "keep": 2}
    assert out["x"] == 1 and out["y"] == 3


def test_apply_dotlist_parses_yaml_scalars():
    cfg = {"model": {"params": {"lr": 1.0}}}
    out = apply_dotlist(cfg, ["model.params.lr=4.5e-6", "data.batch_size=12", "flag=true"])
    assert out["model"]["params"]["lr"] == pytest.approx(4.5e-6)
    assert out["data"]["batch_size"] == 12
    assert out["flag"] is True
    # original untouched
    assert cfg["model"]["params"]["lr"] == 1.0


def test_merge_configs_left_to_right(tmp_path):
    p1 = tmp_path / "a.yaml"
    p1.write_text(textwrap.dedent("""
        model:
          base_learning_rate: 4.5e-6
          params: {embed_dim: 16}
    """))
    p2 = tmp_path / "b.yaml"
    p2.write_text("model:\n  params: {embed_dim: 32}\n")
    cfg = merge_configs([str(p1), str(p2)], ["model.params.embed_dim=64"])
    assert cfg["model"]["params"]["embed_dim"] == 64
    assert cfg["model"]["base_learning_rate"] == pytest.approx(4.5e-6)


def test_instantiate_from_config_plain_target():
    cfg = {"target": "generative_detection_tpu.utils.misc.EasyDict", "params": {"a": 1}}
    obj = instantiate_from_config(cfg)
    assert obj.a == 1


def test_reference_targets_are_aliased():
    # Reference YAMLs (configs/autoencoder/pose/*.yaml) must load unchanged.
    assert resolve_target("src.models.autoencoder.PoseAutoencoder").startswith(
        "generative_detection_tpu."
    )
    assert resolve_target("src.modules.losses.PoseLoss").startswith(
        "generative_detection_tpu."
    )
    assert resolve_target("some.unknown.Target") == "some.unknown.Target"


def test_instantiate_requires_target():
    with pytest.raises(KeyError):
        instantiate_from_config({"params": {}})
