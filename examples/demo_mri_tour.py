"""Tour of the MRI operators (reference examples/physics/demo_mri_tour.py).

Walks the MRI family: masked single-coil FFT (`MRI`), acceleration masks
from the k-space generators, multi-coil with synthetic sensitivity maps
(`MultiCoilMRI`), dynamic k-t acquisition (`DynamicMRI`), and a PnP
reconstruction vs zero-filled baseline.

Run: python examples/demo_mri_tour.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import numpy as np
import jax
import jax.numpy as jnp

from deepinv_tpu.physics import MRI, MultiCoilMRI, DynamicMRI, GaussianNoise
from deepinv_tpu.physics.generator import (
    GaussianMaskGenerator,
    RandomMaskGenerator,
    EquispacedMaskGenerator,
)
from deepinv_tpu.datasets import shepp_logan
from deepinv_tpu.models import DnCNN
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.loss.metric import PSNR

H = W = 128
psnr = PSNR(complex_abs=True)
ph = jnp.asarray(shepp_logan(H))
x = jnp.stack([ph, jnp.zeros_like(ph)])[None]  # (1, 2, H, W) real/imag

# --- acceleration masks from the generators (reference generator/mri.py) ---
for Gen in (GaussianMaskGenerator, RandomMaskGenerator, EquispacedMaskGenerator):
    gen = Gen((H, W), acceleration=4)
    mask = gen.step(1, key=jax.random.key(0))["mask"]
    print(f"{Gen.__name__}: mask {mask.shape}, sampling rate "
          f"{float(jnp.mean(mask)):.3f}")

mask = GaussianMaskGenerator((H, W), acceleration=4).step(
    1, key=jax.random.key(1))["mask"][0]

# --- single-coil masked FFT --------------------------------------------
physics = MRI(mask=mask, img_size=(H, W), noise_model=GaussianNoise(0.01))
y = physics(x, key=jax.random.key(2))
zf = physics.A_adjoint(y)  # zero-filled
print("single-coil y:", y.shape, " zero-filled PSNR:",
      float(psnr(zf, x)[0]))

# --- variational reconstruction (TV prior; swap in DnCNN/DRUNet weights
# --- for learned PnP) ---------------------------------------------------
from deepinv_tpu.optim import TVPrior

model = optim_builder(
    "PGD", data_fidelity=L2(), prior=TVPrior(),
    # TV strength = lambda * stepsize (g_param is only the denoiser sigma)
    params_algo={"stepsize": 1.0, "lambda": 0.002},
    max_iter=20,
)
xhat = jax.jit(lambda m, v, p: m(v, p))(model, y, physics)
print("TV-PGD PSNR:", float(psnr(xhat, x)[0]))

# --- multi-coil with birdcage-style synthetic maps ----------------------
n_coils = 4
yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                      indexing="ij")
maps = jnp.stack([
    jnp.exp(-((yy - cy) ** 2 + (xx - cx) ** 2))
    * jnp.exp(1j * (cx * xx + cy * yy))
    for cy, cx in ((-1, -1), (-1, 1), (1, -1), (1, 1))
])  # (coils, H, W)
maps = maps / jnp.sqrt(jnp.sum(jnp.abs(maps) ** 2, 0, keepdims=True))
mc = MultiCoilMRI(mask=mask, coil_maps=maps[None], img_size=(H, W))
y_mc = mc.A(x)
print("multi-coil y:", y_mc.shape, "(B, C, coils, H, W)")
rss = mc.A_adjoint(y_mc)
print("coil-combined adjoint PSNR:", float(psnr(rss, x)[0]))

# --- dynamic (k-t) MRI --------------------------------------------------
T = 4
xt = jnp.stack([x[0]] * T, axis=1)[None]  # (1, 2, T, H, W)
kt_mask = jnp.stack(
    [EquispacedMaskGenerator((H, W), acceleration=4).step(
        1, key=jax.random.key(10 + t))["mask"][0, 0] for t in range(T)]
)[None, None]  # (1, 1, T, H, W)
dyn = DynamicMRI(mask=kt_mask, img_size=(T, H, W))
y_dyn = dyn.A(xt[0][None] if xt.ndim == 6 else xt)
print("dynamic y:", y_dyn.shape, "(k-t acquisition)")
print("adjointness |<Ax,y>-<x,A'y>|:",
      abs(complex(dyn.adjointness_test(xt if xt.ndim == 5 else xt[0][None]))))
