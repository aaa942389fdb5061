from .misc import EasyDict, log_opts
from .distributions import DiagonalGaussianDistribution

__all__ = ["EasyDict", "log_opts", "DiagonalGaussianDistribution"]
