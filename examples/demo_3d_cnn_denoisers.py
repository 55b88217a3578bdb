"""Volumetric CNN denoisers and 2D->3D weight inflation (counterpart of the
reference's ``dim=3`` model family and ``pretrained='download_2d'`` workflow,
deepinv/models/dncnn.py:34-111).

CT/MRI/microscopy stacks are volumes, but most pretrained denoisers are 2D.
Two options this demo contrasts:

1. apply a 2D denoiser slice by slice (ignores inter-slice structure);
2. build the SAME architecture with cube kernels (``dim=3``) and initialize
   it from the 2D weights with :func:`initialize_3d_from_2d` — axial mode
   places each 2D kernel on the central depth slice, so before any
   fine-tuning the 3D network reproduces the per-slice 2D result exactly on
   depth-constant content, while exposing the depth axis for training.

A short supervised fine-tune on noisy volumes then lets the inflated 3D
network exploit depth correlation that the slice-wise 2D model cannot.
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import jax
import jax.numpy as jnp
import numpy as np

from deepinv_tpu.loss import PSNR
from deepinv_tpu.models import DnCNN, initialize_3d_from_2d


def smooth_volume(D=8, H=32, W=32, seed=0):
    """A volume with strong depth correlation: a tube-like phantom whose
    cross-section drifts slowly with depth."""
    r = np.random.default_rng(seed)
    cy, cx = H / 2, W / 2
    vol = np.zeros((D, H, W), np.float32)
    for d in range(D):
        yy, xx = np.mgrid[0:H, 0:W]
        oy, ox = 3 * np.sin(d / D * np.pi), 3 * np.cos(d / D * np.pi)
        vol[d] = (((yy - cy - oy) ** 2 + (xx - cx - ox) ** 2) < (H / 4) ** 2)
    vol += 0.05 * r.standard_normal(vol.shape).astype(np.float32)
    return jnp.asarray(vol)[None, None]  # (1, 1, D, H, W)


def _train(model, step_fn, state, make_batch, n_steps):
    for i in range(n_steps):
        xt, yt = make_batch(i)
        model, state, _ = step_fn(model, state, xt, yt)
    return model


def main():
    import optax

    sigma = 0.2
    D = _util.scale(8, 8)
    x = smooth_volume(D=D)
    y = x + sigma * jax.random.normal(jax.random.key(0), x.shape)
    psnr = PSNR()

    # a small 2D DnCNN, pre-trained on noisy/clean SLICES (stands in for a
    # pretrained 2D checkpoint)
    den2d = DnCNN(1, 1, depth=4, nf=8, dim=2, key=jax.random.key(1))
    opt2 = optax.adam(2e-3)

    @jax.jit
    def step2(model, st, xt, yt):
        def loss(m):
            return jnp.mean((m(yt, sigma) - xt) ** 2)

        l, g = jax.value_and_grad(loss)(model)
        updates, st = opt2.update(g, st, model)
        return optax.apply_updates(model, updates), st, l

    def slice_batch(i):
        xt = smooth_volume(D=D, seed=100 + i)
        yt = xt + sigma * jax.random.normal(
            jax.random.fold_in(jax.random.key(7), i), xt.shape)
        return (jnp.swapaxes(xt[0], 0, 1), jnp.swapaxes(yt[0], 0, 1))

    den2d = _train(den2d, step2, opt2.init(den2d), slice_batch,
                   _util.scale(120, 10))
    ckpt2d = {}
    for name, conv in [("in_conv", den2d.in_conv),
                       ("out_conv", den2d.out_conv)] + [
            (f"conv_list.{i}", c) for i, c in enumerate(den2d.conv_list)]:
        ckpt2d[f"{name}.weight"] = np.asarray(conv.weight)
        ckpt2d[f"{name}.bias"] = np.asarray(conv.bias)

    # option 1: slice-wise 2D application
    slices = jnp.swapaxes(y[0], 0, 1)             # (D, 1, H, W) batch
    x2d = jnp.swapaxes(den2d(slices, sigma), 0, 1)[None]

    # option 2: 3D network inflated from the 2D weights (axial)
    den3d = DnCNN(1, 1, depth=4, nf=8, dim=3, key=jax.random.key(2))
    initialize_3d_from_2d(den3d, ckpt2d)
    x3d = den3d(y, sigma)

    # before fine-tuning the inflated net IS the slice-wise 2D net
    agree = float(jnp.max(jnp.abs(x3d - x2d)))
    print(f"inflated-3D vs slice-wise-2D (pre-finetune) max |diff|: "
          f"{agree:.2e}")

    print(f"noisy volume        PSNR: {float(jnp.mean(psnr(y, x))):6.2f} dB")
    print(f"slice-wise 2D DnCNN PSNR: {float(jnp.mean(psnr(x2d, x))):6.2f} dB")

    # short supervised fine-tune of the 3D net on noisy/clean volume pairs
    opt = optax.adam(1e-3)

    @jax.jit
    def step3(model, st, xt, yt):
        def loss(m):
            return jnp.mean((m(yt, sigma) - xt) ** 2)

        l, g = jax.value_and_grad(loss)(model)
        updates, st = opt.update(g, st, model)
        return optax.apply_updates(model, updates), st, l

    def vol_batch(i):
        xt = smooth_volume(D=D, seed=10 + i)
        yt = xt + sigma * jax.random.normal(jax.random.fold_in(
            jax.random.key(3), i), xt.shape)
        return xt, yt

    den3d = _train(den3d, step3, opt.init(den3d), vol_batch,
                   _util.scale(80, 8))

    x3d_ft = den3d(y, sigma)
    print(f"fine-tuned 3D DnCNN PSNR: "
          f"{float(jnp.mean(psnr(x3d_ft, x))):6.2f} dB "
          f"(exploits depth correlation)")


if __name__ == "__main__":
    main()
