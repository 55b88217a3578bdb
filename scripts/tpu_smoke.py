"""On-TPU smoke test: construct every operator and run jitted A / A_adjoint /
prox_l2 on the real chip. Run manually: ``python scripts/tpu_smoke.py``.

The axon TPU platform cannot execute certain ops eagerly (reductions, fft,
pad, roll) — everything hot must be inside jit. This script catches any
constructor that accidentally computes eagerly.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from deepinv_tpu.physics import (
    Denoising, Blur, BlurFFT, Downsampling, Upsampling, Inpainting,
    Demosaicing, MRI, MultiCoilMRI, CompressedSensing, GaussianNoise,
    PoissonNoise, compose, stack,
)
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import optim_builder, L2, PnP, TVPrior
from deepinv_tpu.models import DnCNN, DRUNet, TVDenoiser, WaveletDenoiser

IMSIZE = (3, 64, 64)


def check(name, fn):
    try:
        t0 = time.time()
        out = fn()
        jax.block_until_ready(out)
        print(f"  OK   {name}  ({time.time()-t0:.2f}s)")
        return True
    except Exception as e:
        print(f"  FAIL {name}: {type(e).__name__} {str(e)[:110]}")
        return False


def main():
    print("devices:", jax.devices())
    key = jax.random.key(0)
    x = jax.random.normal(key, (2,) + IMSIZE)

    ops = {
        "denoising": lambda: Denoising(noise_model=GaussianNoise(0.1)),
        "blur_circ": lambda: Blur(filter=gaussian_blur(sigma=1.5), padding="circular"),
        "blur_reflect": lambda: Blur(filter=gaussian_blur(sigma=1.5), padding="reflect"),
        "blur_fft": lambda: BlurFFT(img_size=IMSIZE, filter=gaussian_blur(sigma=1.5)),
        "downsampling": lambda: Downsampling(img_size=IMSIZE, filter="bicubic", factor=2),
        "inpainting": lambda: Inpainting(img_size=IMSIZE, mask=0.7),
        "demosaicing": lambda: Demosaicing(img_size=IMSIZE),
        "mri": lambda: MRI(img_size=(64, 64)),
        "cs": lambda: CompressedSensing(m=256, img_size=(1, 32, 32)),
        "cs_fast": lambda: CompressedSensing(m=128, img_size=(1, 32, 32), fast=True),
    }

    all_ok = True
    for name, ctor in ops.items():
        phys = None

        def build():
            nonlocal phys
            phys = ctor()
            return jnp.zeros(())

        ok = check(f"construct {name}", build)
        all_ok &= ok
        if not ok:
            continue
        xin = x
        if name == "mri":
            xin = jax.random.normal(key, (2, 2, 64, 64))
        if name.startswith("cs"):
            xin = jax.random.normal(key, (2, 1, 32, 32))

        fwd = jax.jit(lambda p, v: p.A(v))
        adj = jax.jit(lambda p, v: p.A_adjoint(p.A(v)))
        all_ok &= check(f"A       {name}", lambda: fwd(phys, xin))
        all_ok &= check(f"AtA     {name}", lambda: adj(phys, xin))
        prox = jax.jit(lambda p, v: p.prox_l2(v, p.A(v), 1.0))
        all_ok &= check(f"prox_l2 {name}", lambda: prox(phys, xin))
        noisy = jax.jit(lambda p, v, k: p(v, key=k))
        all_ok &= check(f"noise   {name}", lambda: noisy(phys, xin, key))

    # models
    for mname, ctor in {
        "DnCNN": lambda: DnCNN(depth=6, nf=16),
        "DRUNet": lambda: DRUNet(nc=(16, 32, 32, 64), nb=2),
        "TVDenoiser": lambda: TVDenoiser(50),
        "WaveletDenoiser": lambda: WaveletDenoiser("db4", 2),
    }.items():
        model = None

        def build_m():
            nonlocal model
            model = ctor()
            return jnp.zeros(())

        all_ok &= check(f"construct {mname}", build_m)
        den = jax.jit(lambda m, v: m(v, 0.05))
        all_ok &= check(f"denoise  {mname}", lambda: den(model, x))

    # newer ops: tomography (both projectors), NUFFT MRI, single-pixel
    # (dense-matmul FWHT), Pallas TV prox, BM3D
    from deepinv_tpu.physics import Tomography, SinglePixelCamera
    gray = x[:, :1]
    for name, ctor in {
        "tomography interp": lambda: Tomography(img_width=64, angles=30, method="interp"),
        "tomography fourier": lambda: Tomography(img_width=64, angles=30, method="fourier"),
        "tomography fanbeam": lambda: Tomography(img_width=64, angles=30, fan_beam=True),
        "singlepixel (MXU FWHT)": lambda: SinglePixelCamera(m=512, img_size=(1, 64, 64)),
    }.items():
        phys = None

        def build_p(c=ctor):
            nonlocal phys
            phys = c()
            return jnp.zeros(())

        all_ok &= check(f"construct {name}", build_p)
        fwd = jax.jit(lambda p, v: p.A_adjoint(p.A(v)))
        all_ok &= check(f"A/adjoint {name}", lambda: fwd(phys, gray))

    # slice projector + Toeplitz normal operator, 3D CT, PET, radio NUFFT
    from deepinv_tpu.physics import Tomography3D, PET, RadioInterferometry

    for name, ctor, xin in [
        ("tomography slice+toeplitz",
         lambda: Tomography(img_width=64, angles=30, method="slice", normalize=True),
         gray),
        ("tomography3d",
         lambda: Tomography3D(angles=20, img_size=(2, 48, 48), method="slice"),
         jax.random.normal(key, (1, 1, 2, 48, 48))),
        ("pet (fwhm+3d)",
         lambda: PET(img_size=(2, 48, 48), angles=24, fwhm=2.0),
         jax.random.uniform(key, (1, 1, 2, 48, 48))),
        ("radio nufft",
         lambda: RadioInterferometry(
             (48, 48),
             np.clip(np.random.default_rng(0).normal(size=(2, 1000)), -2.8, 2.8
                     ).astype(np.float32)),
         jax.random.uniform(key, (1, 1, 48, 48))),
        ("conebeam xray (astra-parity)",
         lambda: __import__("deepinv_tpu.physics", fromlist=["TomographyWithAstra"]
                            ).TomographyWithAstra(
             (4, 24, 24), angles=12, angular_range=(0, 360),
             geometry_type="conebeam",
             geometry_parameters={"source_radius": 50.0, "detector_radius": 25.0},
             n_detector_pixels=(6, 34), normalize=False),
         jax.random.uniform(key, (1, 1, 4, 24, 24))),
        ("pet michelogram (oblique LORs)",
         lambda: PET(img_size=(3, 32, 32), angles=16, ring_differences=(0, 1)),
         jax.random.uniform(key, (1, 1, 3, 32, 32))),
    ]:
        phys = None

        def build_p(c=ctor):
            nonlocal phys
            phys = c()
            return jnp.zeros(())

        all_ok &= check(f"construct {name}", build_p)
        nrm = jax.jit(lambda p, v: p.A_adjoint_A(v))
        all_ok &= check(f"AtA       {name}", lambda: nrm(phys, xin))

    from deepinv_tpu.ops.pallas import chambolle_prox
    all_ok &= check("pallas TV prox (VMEM loop)",
                    lambda: jax.jit(lambda v: chambolle_prox(v, 0.1, 50))(gray))
    from deepinv_tpu.models import BM3D
    bm = BM3D(search_radius=5, ref_stride=3)
    all_ok &= check("BM3D", lambda: jax.jit(lambda v: bm(v, 0.1))(gray))

    # full PnP program
    physics = BlurFFT(img_size=IMSIZE, filter=gaussian_blur(sigma=1.5),
                      noise_model=GaussianNoise(0.01))
    y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, key)
    pnp = optim_builder("HQS", data_fidelity=L2(), prior=PnP(TVDenoiser(20)),
                        params_algo={"stepsize": 2.0, "g_param": 0.02}, max_iter=10)
    recon = jax.jit(lambda m, yv, p: m(yv, p))
    all_ok &= check("PnP-HQS full program", lambda: recon(pnp, y, physics))

    print("ALL OK" if all_ok else "FAILURES PRESENT")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
