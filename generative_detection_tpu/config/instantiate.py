"""Config-driven object construction.

First-party replacement for the reference's ``ldm.util.instantiate_from_config``
(/root/reference/train.py:16, used at train.py:345,445,452,459,463,
src/models/autoencoder.py:86,103-104, data_modules.py:83,89): a config node of
the form ``{target: "a.b.C", params: {...}}`` is resolved by importing ``a.b``
and calling ``C(**params)``.

To let *reference* YAML configs load unchanged (same schema, same dotted
targets), reference target paths are transparently remapped onto this
package's classes via ``TARGET_ALIASES``.
"""

from __future__ import annotations

import importlib
from typing import Any, Mapping

# Reference dotted path -> TPU-native class. Keep in sync with
# configs/autoencoder/pose/*.yaml in /root/reference/configs.
TARGET_ALIASES: dict[str, str] = {
    # models (ref: src/models/autoencoder.py:29,34)
    "src.models.autoencoder.Autoencoder":
        "generative_detection_tpu.models.autoencoder.Autoencoder",
    "src.models.autoencoder.PoseAutoencoder":
        "generative_detection_tpu.models.autoencoder.PoseAutoencoder",
    # losses (ref: src/modules/losses/__init__.py)
    "src.modules.losses.PoseLoss":
        "generative_detection_tpu.losses.contperceptual.PoseLoss",
    "src.modules.losses.LPIPSWithDiscriminator":
        "generative_detection_tpu.losses.contperceptual.LPIPSWithDiscriminator",
    "src.modules.losses.contperceptual.PoseLoss":
        "generative_detection_tpu.losses.contperceptual.PoseLoss",
    "src.modules.losses.contperceptual.LPIPSWithDiscriminator":
        "generative_detection_tpu.losses.contperceptual.LPIPSWithDiscriminator",
    # pose modules (ref: src/modules/autoencodermodules/)
    "src.modules.autoencodermodules.pose_decoder.PoseDecoderSpatialVAE":
        "generative_detection_tpu.models.pose_modules.PoseDecoderSpatialVAE",
    "src.modules.autoencodermodules.pose_encoder.PoseEncoderSpatialVAE":
        "generative_detection_tpu.models.pose_modules.PoseEncoderSpatialVAE",
    # data (ref: src/data/)
    "src.data.preprocessing.data_modules.DataModuleFromConfig":
        "generative_detection_tpu.data.datamodule.DataModuleFromConfig",
    "src.data.datasets.nuscenes.NuScenesTrain":
        "generative_detection_tpu.data.nuscenes.NuScenesTrain",
    "src.data.datasets.nuscenes.NuScenesValidation":
        "generative_detection_tpu.data.nuscenes.NuScenesValidation",
    "src.data.datasets.nuscenes.NuScenesTest":
        "generative_detection_tpu.data.nuscenes.NuScenesTest",
    "src.data.datasets.nuscenes.NuScenesTrainMini":
        "generative_detection_tpu.data.nuscenes.NuScenesTrainMini",
    "src.data.datasets.nuscenes.NuScenesValidationMini":
        "generative_detection_tpu.data.nuscenes.NuScenesValidationMini",
    # callbacks (ref: src/util/callbacks.py)
    "src.util.callbacks.ImageLogger":
        "generative_detection_tpu.train.callbacks.ImageLogger",
    "src.util.callbacks.SetupCallback":
        "generative_detection_tpu.train.callbacks.SetupCallback",
    "src.util.callbacks.CUDACallback":
        "generative_detection_tpu.train.callbacks.DeviceStatsCallback",
    "src.util.callbacks.TQDMProgressBar":
        "generative_detection_tpu.train.callbacks.ProgressCallback",
    "src.util.callbacks.DeviceStatsMonitor":
        "generative_detection_tpu.train.callbacks.DeviceStatsCallback",
    "src.util.callbacks.LearningRateMonitor":
        "generative_detection_tpu.train.callbacks.LearningRateCallback",
    "pytorch_lightning.callbacks.ModelCheckpoint":
        "generative_detection_tpu.train.callbacks.CheckpointCallback",
    "pytorch_lightning.loggers.TensorBoardLogger":
        "generative_detection_tpu.train.metrics.MetricsLogger",
    # the reference's logger choice (ref train.py:190-213) also offers wandb
    # and the legacy "testtube" logger. WandbLogger uses the real wandb
    # package when importable and falls back to the wandb run-directory
    # layout (wandb-history.jsonl) otherwise; testtube aliases onto the
    # JSONL+TB logger.
    "pytorch_lightning.loggers.WandbLogger":
        "generative_detection_tpu.train.metrics.WandbLogger",
    "pytorch_lightning.loggers.TestTubeLogger":
        "generative_detection_tpu.train.metrics.MetricsLogger",
}


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Import ``a.b.C`` and return the attribute ``C`` of module ``a.b``."""
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def resolve_target(target: str) -> str:
    return TARGET_ALIASES.get(target, target)


def instantiate_from_config(config: Mapping[str, Any], **extra_kwargs: Any) -> Any:
    """Build an object from a ``{target, params}`` config node.

    ``extra_kwargs`` are merged over ``params`` (used e.g. for injecting
    runtime-only arguments like RNG seeds or directories).
    """
    if not isinstance(config, Mapping) or "target" not in config:
        if config == "__is_first_stage__" or config == "__is_unconditional__":
            return None
        raise KeyError(f"Expected config dict with a `target` key, got: {config!r}")
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    cls = get_obj_from_str(resolve_target(config["target"]))
    return cls(**params)
