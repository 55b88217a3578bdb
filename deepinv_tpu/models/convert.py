"""Torch-checkpoint porting (reference weights from HuggingFace deepinv/*).

The reference downloads per-model ``.pth`` files (models/utils.py:39-46,512).
Here, ``load_torch_checkpoint`` reads a local ``.pth``/``.npz`` file (no
network access assumed) and the ``port_*`` functions map the torch state
dict onto our pytree modules. Conv weights are OIHW on both sides and
ConvTranspose2d weights are IOHW on both sides, so porting is pure renaming.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["load_torch_checkpoint", "port_dncnn", "port_drunet", "port_ram"]


def load_torch_checkpoint(path):
    """Load a torch .pth (via torch, CPU) or .npz state dict into numpy."""
    if isinstance(path, dict):
        sd = path
    elif str(path).endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        out[k] = np.asarray(v.numpy() if hasattr(v, "numpy") else v)
    return out


def _set_conv(conv, sd, prefix):
    conv.weight = jnp.asarray(sd[prefix + ".weight"])
    bkey = prefix + ".bias"
    if bkey in sd:
        conv.bias = jnp.asarray(sd[bkey])
    return conv


def port_dncnn(model, sd):
    """Map reference DnCNN state dict (in_conv / conv_list.i / out_conv)."""
    _set_conv(model.in_conv, sd, "in_conv")
    for i, c in enumerate(model.conv_list):
        _set_conv(c, sd, f"conv_list.{i}")
    _set_conv(model.out_conv, sd, "out_conv")
    return model


def port_ram(model, sd):
    """Map the reference RAM state dict (huggingface mterris/ram) onto our
    bit-faithful RAM (models/ram.py; reference deepinv/models/ram.py:63-117).

    All convs in the checkpoint are bias-free; learnable scalars are
    ``fact_realign`` and each ResBlock's ``gain``.
    """
    model.fact_realign = jnp.asarray(sd["fact_realign"])

    for i, c in enumerate(model.m_head.convs):
        _set_conv(c, sd, f"m_head.conv{i}")
    for i, c in enumerate(model.m_tail.convs):
        _set_conv(c, sd, f"m_tail.conv{i}")
    for name in ("pool1", "pool2", "pool3", "up3", "up2", "up1"):
        _set_conv(getattr(model, name), sd, name)

    def port_headblock(hb, prefix):
        _set_conv(hb.convin, sd, prefix + ".convin")
        if prefix + ".zero_conv_skip.weight" in sd:
            _set_conv(hb.zero_conv_skip, sd, prefix + ".zero_conv_skip")
        for i in range(hb.depth - 1):
            _set_conv(hb.convs1[i], sd, f"{prefix}.conv1{i}")
            _set_conv(hb.convs2[i], sd, f"{prefix}.conv2{i}")
            _set_conv(hb.skipconvs[i], sd, f"{prefix}.skipconv{i}")

    for name in ("m_down1", "m_down2", "m_down3", "m_body",
                 "m_up3", "m_up2", "m_up1"):
        blk = getattr(model, name)
        for j, res in enumerate(blk.enc):
            p = f"{name}.enc.{j}"
            _set_conv(res.conv1, sd, p + ".conv1")
            _set_conv(res.conv2, sd, p + ".conv2")
            res.gain = jnp.asarray(sd[p + ".gain"])
            mc = res.PhysicsBlock
            for i, hb in enumerate(mc.decoding_conv.tails):
                port_headblock(hb, f"{p}.PhysicsBlock.decoding_conv.tail{i}")
            for i, hb in enumerate(mc.encoding_conv.heads):
                port_headblock(hb, f"{p}.PhysicsBlock.encoding_conv.head{i}")
    return model


def port_drunet(model, sd):
    """Map reference DRUNet state dict (m_head, m_downK.i.res.j, ...)."""
    _set_conv(model.m_head, sd, "m_head")
    _set_conv(model.m_tail, sd, "m_tail")

    def port_resblock(block, prefix):
        _set_conv(block.conv1, sd, prefix + ".res.0")
        _set_conv(block.conv2, sd, prefix + ".res.2")

    nb = model.nb
    for name in ("m_down1", "m_down2", "m_down3"):
        seq = getattr(model, name)
        for i in range(nb):
            port_resblock(seq[i], f"{name}.{i}")
        _set_conv(seq[nb], sd, f"{name}.{nb}")
    for i in range(nb):
        port_resblock(model.m_body[i], f"m_body.{i}")
    for name in ("m_up3", "m_up2", "m_up1"):
        seq = getattr(model, name)
        _set_conv(seq[0], sd, f"{name}.0")
        for i in range(nb):
            port_resblock(seq[i + 1], f"{name}.{i + 1}")
    return model
