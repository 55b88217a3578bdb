"""Artifact2Artifact self-supervised training on dynamic (time-resolved) MRI.

Mirrors the reference gallery's self-supervised-learning
``demo_artifact2artifact.py`` (reference loss/mri/measplit.py:493): each
step, a random chunk of acquisition time frames reconstructs the image and
the loss is measured against another random chunk — artifacts decorrelate
across chunks while the anatomy is shared, so the network learns to remove
them without ground truth.
"""

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

from deepinv_tpu.datasets import random_circles
from deepinv_tpu.loss import Artifact2ArtifactLoss
from deepinv_tpu.models import DnCNN
from deepinv_tpu.physics import DynamicMRI, GaussianNoise
from deepinv_tpu.physics.generator import RandomMaskGenerator


def main():
    key = jax.random.key(0)
    C, T, H, W = 2, 4, 32, 32

    # dynamic object: a moving disc, shared anatomy across frames
    frames = np.stack([np.roll(random_circles(H, seed=1), s, axis=-1)
                       for s in range(T)], axis=1)  # (1, T, H, W)
    x = jnp.asarray(np.concatenate([frames, np.zeros_like(frames)], 0))[None]
    # (B=1, C=2 real/imag, T, H, W)

    # per-frame random k-t masks, shared across the real/imag channels so
    # the (C, T, H, W) mask matches the A2A splitting generator's layout
    gen = RandomMaskGenerator((T, H, W), acceleration=2)
    mask = gen.step(1, key=key)["mask"][0]
    mask = jnp.broadcast_to(mask, (C,) + mask.shape[-3:])
    physics = DynamicMRI(mask=mask, noise_model=GaussianNoise(0.01))
    y = physics(x, key=jax.random.fold_in(key, 1))

    # time-agnostic denoiser backbone: fold T into the batch
    net = DnCNN(2, 2, depth=3, nf=8, key=jax.random.fold_in(key, 2))

    def model(yy, p, **kw):
        xin = p.A_adjoint(yy)
        B, Cc, Tt, Hh, Ww = xin.shape
        flat = xin.transpose(0, 2, 1, 3, 4).reshape(B * Tt, Cc, Hh, Ww)
        out = net(flat, 0.05)
        return out.reshape(B, Tt, Cc, Hh, Ww).transpose(0, 2, 1, 3, 4)

    loss = Artifact2ArtifactLoss((C, T, H, W), split_size=2)
    adapted = loss.adapt_model(model)

    opt = optax.adam(1e-3)
    opt_state = opt.init(net)

    @jax.jit
    def step(net_, opt_state_, k):
        def fwd(n):
            def m(yy, p, **kw):
                xin = p.A_adjoint(yy)
                B, Cc, Tt, Hh, Ww = xin.shape
                flat = xin.transpose(0, 2, 1, 3, 4).reshape(B * Tt, Cc, Hh, Ww)
                out = n(flat, 0.05)
                return out.reshape(B, Tt, Cc, Hh, Ww).transpose(0, 2, 1, 3, 4)

            am = loss.adapt_model(m)
            return jnp.mean(loss(y=y, physics=physics, model=am, key=k))

        l, g = jax.value_and_grad(fwd)(net_)
        updates, opt_state_ = opt.update(g, opt_state_, net_)
        net_ = optax.apply_updates(net_, updates)
        return net_, opt_state_, l

    losses = []
    for i in range(50):
        net, opt_state, l = step(net, opt_state, jax.random.fold_in(key, 10 + i))
        losses.append(float(l))
    print(f"A2A loss: {losses[0]:.5f} -> {losses[-1]:.5f}")
    assert losses[-1] < losses[0], "self-supervised training should reduce the loss"

    # (a real run trains for many epochs on a dataset; this smoke run only
    # checks the self-supervised loss goes down end-to-end under jit)
    print("Artifact2Artifact OK")


if __name__ == "__main__":
    main()
