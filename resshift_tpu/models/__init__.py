from .unet import UNetModelSwin
from .vqgan import VQModel, Encoder, Decoder, VectorQuantizer
from . import layers, swin

__all__ = ["UNetModelSwin", "VQModel", "Encoder", "Decoder", "VectorQuantizer", "layers", "swin"]
