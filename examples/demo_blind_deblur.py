"""Blind space-varying deblurring with the kernel identification network.

Mirrors the reference's blind-inverse-problems gallery category
(examples/blind-inverse-problems/): a KernelIdentificationNetwork
(Carbajal et al. J-MKPD; reference models/kernel_network.py:9) predicts
per-pixel mixtures of blur kernels from the blurry image alone; those plug
into SpaceVaryingBlur (product convolution), after which any non-blind
solver applies. Here: estimate the operator, then run PnP-PGD with a DnCNN
prior on the *estimated* physics.

With ``pretrained=None`` the network is untrained, so the demo exercises the
full pipeline shape-wise; pass the published
``carbajal_kernel_identification_network.pth`` to get real estimates (it
ports directly via ``models.convert.port_kernel_network``).

Run: python examples/demo_blind_deblur.py
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

from deepinv_tpu.models import KernelIdentificationNetwork, DnCNN
from deepinv_tpu.physics import SpaceVaryingBlur, GaussianNoise
from deepinv_tpu.physics.generator import DiffractionBlurGenerator
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.loss.metric import PSNR

H = W = 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, 3, H, W)), jnp.float32)

# ground-truth space-varying blur: K=2 diffraction kernels, smooth masks
gen = DiffractionBlurGenerator(psf_size=(9, 9))
psfs = gen.step(2, key=jax.random.key(1))["filter"]  # (2, 1, 9, 9)
gx = jnp.linspace(0, 1, W)[None, :] * jnp.ones((H, 1))
masks = jnp.stack([gx, 1.0 - gx])[None, None]  # (1, 1, 2, H, W)
filters = jnp.swapaxes(psfs, 0, 1)[None]  # (1, 1, 2, 9, 9)
physics_true = SpaceVaryingBlur(
    filters=filters, multipliers=masks, padding="reflect",
    noise_model=GaussianNoise(0.01),
)
y = physics_true(x, key=jax.random.key(2))
print("blurry:", y.shape)

# blind step: estimate kernels + masks from y alone
kin = KernelIdentificationNetwork(filters=4, blur_kernel_size=33, pretrained=None)
est = jax.jit(lambda m, v: m(v))(kin, y)
print("estimated filters:", est["filters"].shape, "multipliers:", est["multipliers"].shape)

physics_est = SpaceVaryingBlur(
    filters=est["filters"], multipliers=est["multipliers"], padding="reflect"
)

# non-blind solve on the estimated operator
model = optim_builder(
    "PGD",
    data_fidelity=L2(),
    prior=PnP(DnCNN(3, 3, pretrained=None)),
    params_algo={"stepsize": 1.0, "g_param": 0.03},
    max_iter=8,
)
xhat = jax.jit(lambda m, v, p: m(v, p))(model, y, physics_est)
psnr = PSNR()
print("PSNR blurry:", float(psnr(y, x)[0]), "-> recon:", float(psnr(xhat, x)[0]),
      "(KIN and DnCNN are untrained here: load the published checkpoints "
      "for real blind deblurring)")
