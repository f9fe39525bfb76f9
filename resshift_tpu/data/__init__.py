from . import degradations, noise
from .realesrgan import DegradationConfig, RealESRGANDegrader, paired_random_crop

__all__ = ["degradations", "noise", "DegradationConfig", "RealESRGANDegrader",
           "paired_random_crop"]
