"""deepinv_tpu: a TPU-native JAX framework for deep-learning imaging inverse
problems, with the capabilities of deepinv/deepinv re-designed for XLA/Pallas.

Four core abstractions (mirroring the reference's public surface):

- ``physics(x, key=...)`` — forward operators with ``A`` / ``A_adjoint`` /
  ``A_dagger`` / ``prox_l2``;
- ``denoiser(x, sigma)`` — denoisers;
- ``model(y, physics)`` — reconstructors;
- ``loss(x_net=..., x=..., y=..., physics=..., model=...)`` — training losses.

Everything is a pytree: jit/vmap/grad/shard over physics and models directly.
"""

from . import core
from . import ops
from . import physics
from . import optim

from .core import Module, TensorList

__version__ = "0.1.0"
