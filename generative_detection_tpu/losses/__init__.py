from .contperceptual import PoseLoss, LPIPSWithDiscriminator, adopt_weight

__all__ = ["PoseLoss", "LPIPSWithDiscriminator", "adopt_weight"]
