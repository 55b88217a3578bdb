"""ArtifactRemoval adapter (reference deepinv/models/artifactremoval.py).

Turns a denoiser into a reconstructor: backbone applied to a first-pass
inversion of the measurements (adjoint / dagger / pseudoinverse init).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Reconstructor

__all__ = ["ArtifactRemoval"]


class ArtifactRemoval(Reconstructor):
    """``xhat = backbone(A_init(y))`` with ``mode`` in
    {'adjoint', 'dagger', 'direct'} (reference artifactremoval.py:15).

    :Examples:

        Turn any denoiser into a reconstructor (e.g. FBP + denoiser for CT):

        >>> import jax
        >>> from deepinv_tpu.models import ArtifactRemoval, MedianFilter
        >>> from deepinv_tpu.physics import Tomography
        >>> physics = Tomography(angles=12, img_width=16, circle=True)
        >>> model = ArtifactRemoval(MedianFilter(), mode="dagger")
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 16, 16))
        >>> model(physics.A(x), physics).shape
        (1, 1, 16, 16)
    """

    def __init__(self, backbone_net, mode: str = "adjoint", sigma=0.05):
        self.backbone_net = backbone_net
        self.mode = mode
        self.sigma = sigma

    def backbone_inference(self, x_in, physics=None, y=None):
        return self.backbone_net(x_in, self.sigma)

    def __call__(self, y, physics, **kwargs):
        if self.mode == "adjoint":
            x_in = physics.A_adjoint(y)
        elif self.mode == "dagger":
            x_in = physics.A_dagger(y)
        elif self.mode == "direct":
            x_in = y
        else:
            raise ValueError(f"unknown mode {self.mode!r}")
        return self.backbone_inference(x_in, physics, y)
