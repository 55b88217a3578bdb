"""VGG16 feature extractor (torchvision ``vgg16().features`` layout).

Backbone for perceptual metrics/losses — the reference reaches VGG through
the pyiqa/lpips packages (deepinv/loss/metric/perceptual.py:13 LPIPS). Here
the architecture is native; torchvision ``vgg16`` checkpoints port
leaf-for-leaf via :func:`port_vgg16` (``features.<idx>.weight`` naming), so
users with a local copy of the weights get the standard feature stack.

``VGG16Features(x)`` returns the five ReLU feature maps LPIPS uses:
relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .layers import Conv2d, MaxPool2d

__all__ = ["VGG16Features", "port_vgg16"]

# torchvision VGG16 'D' configuration: channels per conv, 'M' = maxpool
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512, "M"]
# indices (into the torch nn.Sequential incl. ReLUs) of each conv layer
_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
# which conv (0-based, post-ReLU) ends each LPIPS stage
_STAGE_END = [1, 3, 6, 9, 12]


class VGG16Features(Module):
    """VGG16 convolutional trunk returning the 5 LPIPS feature stages.

    :param pretrained: path to a torchvision ``vgg16`` state dict (``.pth``)
        to load; None keeps the random initialization.
    :param requires_input_norm: when True (default), inputs in [0, 1] are
        normalized with the ImageNet mean/std before the first conv.
    """

    def __init__(self, pretrained=None, requires_input_norm: bool = True, key=None):
        key = key if key is not None else jax.random.key(0)
        convs = []
        cin = 3
        ks = iter(jax.random.split(key, 16))
        for c in _CFG:
            if c == "M":
                continue
            convs.append(Conv2d(cin, c, 3, 1, 1, bias=True, key=next(ks)))
            cin = c
        self.convs = convs
        self.pool = MaxPool2d(2)
        self.requires_input_norm = requires_input_norm
        self.mean = jnp.asarray([0.485, 0.456, 0.406]).reshape(1, 3, 1, 1)
        self.std = jnp.asarray([0.229, 0.224, 0.225]).reshape(1, 3, 1, 1)
        if pretrained is not None:
            from .convert import load_torch_checkpoint

            ported = port_vgg16(self, load_torch_checkpoint(pretrained))
            self.__dict__.update(ported.__dict__)

    def __call__(self, x):
        if x.shape[1] == 1:
            x = jnp.repeat(x, 3, axis=1)
        if self.requires_input_norm:
            x = (x - self.mean.astype(x.dtype)) / self.std.astype(x.dtype)
        feats = []
        h = x
        # pools sit after convs 1, 3, 6, 9 in config 'D' (the last pool,
        # after conv 12, is beyond every LPIPS tap)
        for i, conv in enumerate(self.convs):
            h = jax.nn.relu(conv(h))
            if i in _STAGE_END:
                feats.append(h)
            if i in (1, 3, 6, 9):
                h = self.pool(h)
        return feats


def port_vgg16(model: VGG16Features, sd: dict) -> VGG16Features:
    """Map a torchvision ``vgg16`` state dict (``features.<idx>.*``) onto
    :class:`VGG16Features`."""
    convs = []
    for conv, idx in zip(model.convs, _TORCH_IDX):
        w = jnp.asarray(sd[f"features.{idx}.weight"])
        b = jnp.asarray(sd[f"features.{idx}.bias"])
        convs.append(conv.replace(weight=w, bias=b))
    out = model.replace(convs=convs)
    return out
