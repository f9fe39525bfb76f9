from .unet import UNetModelSwin
from .unet_variants import UNetModel, UNetModelConv, GlobalAttentionBlock
from .vqgan import (AutoencoderKL, Decoder, Encoder, IdentityFirstStage,
                    VQModel, VectorQuantizer)
from .lpips import LPIPS
from . import layers, swin

__all__ = ["UNetModelSwin", "UNetModel", "UNetModelConv", "GlobalAttentionBlock",
           "VQModel", "AutoencoderKL", "IdentityFirstStage", "Encoder", "Decoder",
           "VectorQuantizer", "LPIPS", "layers", "swin"]
