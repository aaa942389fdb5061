from .datamodule import DataModuleFromConfig
from .synthetic import SyntheticPatchTrain, SyntheticPatchValidation, SyntheticPatchTest

__all__ = [
    "DataModuleFromConfig",
    "SyntheticPatchTrain",
    "SyntheticPatchValidation",
    "SyntheticPatchTest",
]
