"""Cone-beam CT with FDK reconstruction — TomographyWithAstra, natively.

The reference reaches 3D cone-beam geometry only through the astra-toolbox
CUDA bridge (deepinv/physics/tomography.py:353). Here the same API runs as a
pure-XLA ray-driven projector (deepinv_tpu/ops/xray.py) with an *exact*
adjoint, so iterative solvers (CG A_dagger, PnP) work out of the box on top
of the FDK initialization.

Run: python examples/demo_conebeam_fdk.py
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

from deepinv_tpu.physics import TomographyWithAstra, GaussianNoise
from deepinv_tpu.loss.metric import PSNR

# 3D phantom: a few ellipsoids (Shepp-Logan-ish), 32^3
D = H = W = 16 if _util.fast() else 32
zz, yy, xx = np.meshgrid(
    np.linspace(-1, 1, D), np.linspace(-1, 1, H), np.linspace(-1, 1, W),
    indexing="ij",
)
vol = (
    1.0 * ((xx / 0.7) ** 2 + (yy / 0.9) ** 2 + (zz / 0.8) ** 2 < 1)
    - 0.5 * ((xx / 0.55) ** 2 + (yy / 0.75) ** 2 + (zz / 0.65) ** 2 < 1)
    + 0.4 * (((xx - 0.2) / 0.15) ** 2 + (yy / 0.2) ** 2 + (zz / 0.3) ** 2 < 1)
    + 0.4 * (((xx + 0.2) / 0.15) ** 2 + (yy / 0.25) ** 2 + (zz / 0.3) ** 2 < 1)
).astype(np.float32)
x = jnp.asarray(vol)[None, None]

physics = TomographyWithAstra(
    img_size=(D, H, W),
    angles=_util.scale(90, 30),
    angular_range=(0, 360),
    geometry_type="conebeam",
    geometry_parameters={"source_radius": 90.0, "detector_radius": 30.0},
    n_detector_pixels=(24, 32) if _util.fast() else (48, 64),
    detector_spacing=(1.5, 1.5),
    normalize=True,
    noise_model=GaussianNoise(0.01),
)

y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(0))
print("radiographs:", y.shape, "(B, C, det-rows, angles, det-cols)")

# FDK (cosine-weighted filtered backprojection) — one jitted call
fdk = jax.jit(lambda p, v: p.A_dagger(v, fbp=True))(physics, y)
psnr = PSNR()
print("FDK PSNR      :", float(psnr(fdk, x)[0]))

# refine with CG on the normal equations (exact adjoint makes this sound)
cg = jax.jit(lambda p, v: p.A_dagger(v))(physics, y)
print("CG-dagger PSNR:", float(psnr(cg, x)[0]))
