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

__all__ = ["load_torch_checkpoint", "port_dncnn", "port_drunet", "port_ram", "port_deal",
           "port_swinir", "port_scunet", "port_restormer", "port_ncsnpp",
           "port_srresnet", "port_dsccp", "port_kernel_network"]


def load_torch_checkpoint(path):
    """Load a torch .pth (via torch, CPU) or .npz state dict into numpy."""
    if isinstance(path, dict):
        sd = path
    elif str(path).endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrap in ("params_ema", "params", "state_dict"):
        if wrap in sd and isinstance(sd[wrap], dict):
            sd = sd[wrap]
            break
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


def _set_linear(lin, sd, prefix):
    lin.weight = jnp.asarray(sd[prefix + ".weight"])
    if prefix + ".bias" in sd:
        lin.bias = jnp.asarray(sd[prefix + ".bias"])
    return lin


def port_swinir(model, sd):
    """Map the reference SwinIR state dict (JingyunLiang/SwinIR releases,
    reference models/swinir.py:795) onto our bit-faithful SwinIR."""
    _set_conv(model.conv_first, sd, "conv_first")
    _set_linear(model.patch_norm, sd, "patch_embed.norm")
    _set_linear(model.norm, sd, "norm")
    _set_conv(model.conv_after_body, sd, "conv_after_body")
    for i, layer in enumerate(model.layers):
        lp = f"layers.{i}"
        for j, blk in enumerate(layer.blocks):
            bp = f"{lp}.residual_group.blocks.{j}"
            _set_linear(blk.norm1, sd, bp + ".norm1")
            _set_linear(blk.norm2, sd, bp + ".norm2")
            blk.attn.relative_position_bias_table = jnp.asarray(
                sd[bp + ".attn.relative_position_bias_table"])
            _set_linear(blk.attn.qkv, sd, bp + ".attn.qkv")
            _set_linear(blk.attn.proj, sd, bp + ".attn.proj")
            _set_linear(blk.fc1, sd, bp + ".mlp.fc1")
            _set_linear(blk.fc2, sd, bp + ".mlp.fc2")
        _set_conv(layer.conv, sd, lp + ".conv")
    if model.upsampler == "pixelshuffle":
        _set_conv(model.conv_before_upsample, sd, "conv_before_upsample.0")
        for k, up in enumerate(model.upsample):
            _set_conv(up, sd, f"upsample.{2 * k}")
        _set_conv(model.conv_last, sd, "conv_last")
    elif model.upsampler == "pixelshuffledirect":
        _set_conv(model.upsample[0], sd, "upsample.0")
    elif model.upsampler == "nearest+conv":
        _set_conv(model.conv_before_upsample, sd, "conv_before_upsample.0")
        _set_conv(model.conv_up1, sd, "conv_up1")
        if hasattr(model, "conv_up2"):
            _set_conv(model.conv_up2, sd, "conv_up2")
        _set_conv(model.conv_hr, sd, "conv_hr")
        _set_conv(model.conv_last, sd, "conv_last")
    else:
        _set_conv(model.conv_last, sd, "conv_last")
    return model


def port_scunet(model, sd):
    """Map the reference SCUNet state dict (cszn/SCUNet
    ``scunet_color_real_psnr.pth``; reference models/scunet.py:284) onto our
    bit-faithful SCUNet."""

    def port_ctb(blk, prefix):
        _set_conv(blk.conv1_1, sd, prefix + ".conv1_1")
        _set_conv(blk.conv1_2, sd, prefix + ".conv1_2")
        _set_conv(blk.conv_a, sd, prefix + ".conv_block.0")
        _set_conv(blk.conv_b, sd, prefix + ".conv_block.2")
        tb = blk.trans_block
        _set_linear(tb.ln1, sd, prefix + ".trans_block.ln1")
        _set_linear(tb.ln2, sd, prefix + ".trans_block.ln2")
        _set_linear(tb.mlp_fc1, sd, prefix + ".trans_block.mlp.0")
        _set_linear(tb.mlp_fc2, sd, prefix + ".trans_block.mlp.2")
        _set_linear(tb.msa.embedding_layer, sd,
                    prefix + ".trans_block.msa.embedding_layer")
        _set_linear(tb.msa.linear, sd, prefix + ".trans_block.msa.linear")
        tb.msa.relative_position_params = jnp.asarray(
            sd[prefix + ".trans_block.msa.relative_position_params"])

    _set_conv(model.m_head, sd, "m_head.0")
    _set_conv(model.m_tail, sd, "m_tail.0")
    for name in ("m_down1", "m_down2", "m_down3"):
        mods = getattr(model, name)
        for i, blk in enumerate(mods[:-1]):
            port_ctb(blk, f"{name}.{i}")
        _set_conv(mods[-1], sd, f"{name}.{len(mods) - 1}")
    for i, blk in enumerate(model.m_body):
        port_ctb(blk, f"m_body.{i}")
    for name in ("m_up3", "m_up2", "m_up1"):
        mods = getattr(model, name)
        _set_conv(mods[0], sd, f"{name}.0")
        for i, blk in enumerate(mods[1:]):
            port_ctb(blk, f"{name}.{i + 1}")
    return model


def port_restormer(model, sd):
    """Map the reference Restormer state dict (deepinv-hosted
    gaussian_*_denoising_blind.pth / deraining.pth / ...; reference
    models/restormer.py:14) onto our bit-faithful Restormer."""

    def port_tb(blk, prefix):
        _set_linear(blk.norm1, sd, prefix + ".norm1.body")
        _set_linear(blk.norm2, sd, prefix + ".norm2.body")
        blk.attn.temperature = jnp.asarray(sd[prefix + ".attn.temperature"])
        _set_conv(blk.attn.qkv, sd, prefix + ".attn.qkv")
        _set_conv(blk.attn.qkv_dw, sd, prefix + ".attn.qkv_dwconv")
        _set_conv(blk.attn.proj, sd, prefix + ".attn.project_out")
        _set_conv(blk.ffn.inp, sd, prefix + ".ffn.project_in")
        _set_conv(blk.ffn.dw, sd, prefix + ".ffn.dwconv")
        _set_conv(blk.ffn.out, sd, prefix + ".ffn.project_out")

    _set_conv(model.patch_embed, sd, "patch_embed.proj")
    enc_names = ["encoder_level1", "encoder_level2", "encoder_level3", "latent"]
    for l, name in enumerate(enc_names):
        for i, blk in enumerate(model.enc[l]):
            port_tb(blk, f"{name}.{i}")
    for conv, name in zip(model.downs, ["down1_2", "down2_3", "down3_4"]):
        _set_conv(conv.conv, sd, f"{name}.body.0")
    for up, name in zip(model.ups, ["up4_3", "up3_2", "up2_1"]):
        _set_conv(up.conv, sd, f"{name}.body.0")
    _set_conv(model.reduce[0], sd, "reduce_chan_level3")
    _set_conv(model.reduce[1], sd, "reduce_chan_level2")
    dec_names = ["decoder_level3", "decoder_level2", "decoder_level1"]
    for l, name in enumerate(dec_names):
        for i, blk in enumerate(model.dec[l]):
            port_tb(blk, f"{name}.{i}")
    for i, blk in enumerate(model.refine):
        port_tb(blk, f"refinement.{i}")
    if getattr(model, "dual_pixel_task", False):
        _set_conv(model.skip_conv, sd, "skip_conv")
    _set_conv(model.out_conv, sd, "output")
    return model


def port_ncsnpp(model, sd):
    """Map the reference NCSNpp/DDPM++ (EDM SongUNet) state dict
    (edm-*-uncond-{ve,vp}.pt; reference models/ncsnpp.py:18) onto our
    bit-faithful NCSNpp."""

    def port_updown(conv, prefix):
        if conv.weight is not None:
            conv.weight = jnp.asarray(sd[prefix + ".weight"])
        if conv.bias is not None and prefix + ".bias" in sd:
            conv.bias = jnp.asarray(sd[prefix + ".bias"])

    def port_gn(gn, prefix):
        gn.weight = jnp.asarray(sd[prefix + ".weight"])
        gn.bias = jnp.asarray(sd[prefix + ".bias"])

    def port_unetblock(blk, prefix):
        port_gn(blk.norm0, prefix + ".norm0")
        port_updown(blk.conv0, prefix + ".conv0")
        blk.affine_w = jnp.asarray(sd[prefix + ".affine.weight"])
        blk.affine_b = jnp.asarray(sd[prefix + ".affine.bias"])
        port_gn(blk.norm1, prefix + ".norm1")
        port_updown(blk.conv1, prefix + ".conv1")
        if blk.skip is not None:
            port_updown(blk.skip, prefix + ".skip")
        if blk.num_heads:
            port_gn(blk.norm2, prefix + ".norm2")
            port_updown(blk.qkv, prefix + ".qkv")
            port_updown(blk.proj, prefix + ".proj")

    if "map_noise.freqs" in sd:
        model.map_noise.freqs = jnp.asarray(sd["map_noise.freqs"])
    if model.map_augment_w is not None and "map_augment.weight" in sd:
        model.map_augment_w = jnp.asarray(sd["map_augment.weight"])
    model.map_layer0_w = jnp.asarray(sd["map_layer0.weight"])
    model.map_layer0_b = jnp.asarray(sd["map_layer0.bias"])
    model.map_layer1_w = jnp.asarray(sd["map_layer1.weight"])
    model.map_layer1_b = jnp.asarray(sd["map_layer1.bias"])

    from .ncsnpp import UNetBlock, UpDownConv2d

    for names, blocks, top in ((model.enc_names, model.enc_blocks, "enc"),
                               (model.dec_names, model.dec_blocks, "dec")):
        for name, blk in zip(names, blocks):
            prefix = f"{top}.{name}"
            if isinstance(blk, UNetBlock):
                port_unetblock(blk, prefix)
            elif isinstance(blk, UpDownConv2d):
                port_updown(blk, prefix)
            else:  # GroupNorm (aux_norm)
                port_gn(blk, prefix)
    return model


def port_srresnet(model, sd):
    """Map the reference SRResNet state dict (srresnet_ckpt.pth.tar;
    reference models/srresnet.py:20) onto our bit-faithful SRResNet."""

    def port_norm(norm, prefix):
        for attr, name in (("weight", "weight"), ("bias", "bias"),
                           ("running_mean", "running_mean"),
                           ("running_var", "running_var")):
            k = f"{prefix}.{name}"
            if k in sd and hasattr(norm, attr):
                setattr(norm, attr, jnp.asarray(sd[k]))

    def port_prelu(act, prefix):
        if prefix + ".weight" in sd:
            act.weight = jnp.asarray(sd[prefix + ".weight"])

    _set_conv(model.fe_conv, sd, "fe.0")
    port_prelu(model.fe_act, "fe.1")
    for i, blk in enumerate(model.blocks):
        _set_conv(blk.conv1, sd, f"blocks.{i}.layers.0")
        port_norm(blk.n1, f"blocks.{i}.layers.1")
        port_prelu(blk.act, f"blocks.{i}.layers.2")
        _set_conv(blk.conv2, sd, f"blocks.{i}.layers.3")
        port_norm(blk.n2, f"blocks.{i}.layers.4")
    _set_conv(model.block_conv, sd, "block.0")
    port_norm(model.block_norm, "block.1")
    for s_i, (conv, act) in enumerate(zip(model.up_convs, model.up_acts)):
        _set_conv(conv, sd, f"upsampling.{s_i}.0")
        port_prelu(act, f"upsampling.{s_i}.2")
    _set_conv(model.final_conv, sd, "final_conv.0")
    return model


def port_dsccp(model, sd):
    """Map the reference DScCP state dict (ckpt_dsccp.pth.tar; reference
    models/dsccp.py:15). conv.{2k} and conv.{2k+1} are tied in the
    reference, so only the even entries are read."""
    model.weights = [jnp.asarray(sd[f"conv.{2 * k}.weight"])
                     for k in range(model.depth)]
    model.mu = jnp.asarray(sd["mu"])
    return model


def port_kernel_network(model, sd):
    """Map the reference KernelIdentificationNetwork state dict
    (carbajal_kernel_identification_network.pth; reference
    models/kernel_network.py:9)."""

    def port_up(up, prefix):
        if not up.bilinear:
            _set_conv(up.up, sd, prefix + ".up")
        _set_conv(up.conv1, sd, prefix + ".double_conv.0")
        _set_conv(up.conv2, sd, prefix + ".double_conv.2")
        _set_conv(up.feat, sd, prefix + ".feat.0")

    _set_conv(model.inc_rgb, sd, "inc_rgb.0")
    _set_conv(model.inc_gray, sd, "inc_gray.0")
    for i in range(1, 6):
        d = getattr(model, f"down{i}")
        _set_conv(d.conv1, sd, f"down{i}.double_conv.0")
        _set_conv(d.conv2, sd, f"down{i}.double_conv.2")
    _set_conv(model.feat, sd, "feat.0")
    for i in range(1, 6):
        port_up(getattr(model, f"up{i}"), f"up{i}")
        port_up(getattr(model, f"kernel_up{i}"), f"kernel_up{i}")
    if hasattr(model, "kernel_up6"):
        port_up(model.kernel_up6, "kernel_up6")
    for j, idx in enumerate((0, 2, 4)):
        _set_conv(model.masks_end[j], sd, f"masks_end.{idx}")
        _set_conv(model.kernels_end[j], sd, f"kernels_end.{idx}")
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


def port_deal(model, sd):
    """Map the reference DEAL state dict (reference models/deal.py:15;
    published deal_gray.pth / deal_color.pth) onto our DEAL.

    Accepts keys with or without the ``model.`` prefix and handles the
    ZeroMean parametrization (``parametrizations.weight.original``) on the
    first W1/M1 layers — our MultiConv2d applies zero-mean at call time,
    so the *original* coefficients are stored.
    """
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def conv_weight(prefix):
        for k in (f"{prefix}.parametrizations.weight.original",
                  f"{prefix}.weight"):
            if k in sd:
                return jnp.asarray(sd[k])
        raise KeyError(prefix)

    for mc, name in ((model.W1, "W1"), (model.M1, "M1")):
        mc.weights = [
            conv_weight(f"{name}.conv_layers.{j}")
            for j in range(len(mc.weights))
        ]
    model.M2 = jnp.asarray(sd["M2.weight"])
    model.M3 = jnp.asarray(sd["M3.weight"])
    for spline in ("spline1", "spline2", "spline3", "spline_lambda",
                   "spline_scaling"):
        getattr(model, spline).coefficients = jnp.asarray(
            sd[f"{spline}.coefficients"]
        )
    return model
