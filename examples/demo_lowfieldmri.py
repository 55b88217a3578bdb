"""Low-field MRI denoising without ground truth
(counterpart of reference examples/self-supervised-learning/
demo_lowfieldmri.py).

Low-field scanners produce very noisy magnitude images and clean
references are unobtainable (repetition averages blur under motion). We
train a denoiser on the noisy repetitions themselves with the
Recorrupted-to-Recorrupted loss — R2R's corruption pair makes the MSE an
unbiased estimate of the supervised risk, so no ground truth is needed.
The reference fine-tunes RAM on M4Raw data; offline we train a small
DnCNN on synthetic repetitions of one scan.
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
import optax

from deepinv_tpu.physics import Denoising, GaussianNoise
from deepinv_tpu.models import DnCNN
from deepinv_tpu.loss import R2RLoss, PSNR
from deepinv_tpu.datasets import shepp_logan


def main(steps=250):
    # one anatomical slice; 3 noisy "repetitions" of the same scan, with a
    # small motion shift between them (what makes plain averaging blurry)
    x = jnp.asarray(shepp_logan(64))[None, None]
    sigma = 0.15
    reps = []
    for i, shift in enumerate((0, 1, -1)):
        moved = jnp.roll(x, shift, axis=-1)
        reps.append(moved + sigma * jax.random.normal(
            jax.random.key(i), x.shape))
    y = jnp.concatenate(reps)              # (3, 1, H, W) noisy repetitions
    y_avg = jnp.mean(y, axis=0, keepdims=True)  # motion-blurred average
    psnr = PSNR()

    physics = Denoising(noise_model=GaussianNoise(sigma))
    loss = R2RLoss()
    model = loss.adapt_model(DnCNN(1, 1, depth=5, nf=16))

    opt = optax.adam(1e-3)
    opt_state = opt.init(model)

    @jax.jit
    def train_step(model, opt_state, key):
        def loss_fn(m):
            return jnp.mean(loss(y=y, physics=physics, model=m, key=key))

        v, g = jax.value_and_grad(loss_fn)(model)
        updates, opt_state = opt.update(g, opt_state, model)
        return optax.apply_updates(model, updates), opt_state, v

    key = jax.random.key(10)
    for it in range(steps):
        key, k = jax.random.split(key)
        model, opt_state, v = train_step(model, opt_state, k)

    xhat = model(y[:1], physics)  # denoise a single repetition
    print(f"single repetition      PSNR: {float(psnr(y[:1], x)[0]):6.2f} dB")
    print(f"3-repetition average   PSNR: {float(psnr(y_avg, x)[0]):6.2f} dB "
          f"(motion-blurred)")
    print(f"R2R-trained denoiser   PSNR: {float(psnr(xhat, x)[0]):6.2f} dB "
          f"(no ground truth, single repetition)")


if __name__ == "__main__":
    main()
