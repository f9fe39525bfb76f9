"""Import the reference PyTorch models (read-only, /root/reference) for
parity testing.  The reference needs `timm` (only DropPath / to_2tuple /
trunc_normal_), which is absent in this image — stub it before import."""

import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


def _install_timm_stub():
    if "timm.models.layers" in sys.modules:
        return
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tml = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(a * std, b * std)
        return t

    tml.DropPath, tml.to_2tuple, tml.trunc_normal_ = DropPath, to_2tuple, trunc_normal_
    timm.models = tm
    tm.layers = tml
    sys.modules.update({"timm": timm, "timm.models": tm, "timm.models.layers": tml})


def load_reference():
    """Returns (UNetModelSwin, VQModelTorch) torch classes from the reference."""
    _install_timm_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models.unet import UNetModelSwin  # noqa: E501  (reference module)
    from ldm.models.autoencoder import VQModelTorch

    return UNetModelSwin, VQModelTorch
