"""Model adapters and wrappers (reference deepinv/models/{GSPnP.py,
equivariant.py, dynamic.py, complex.py, icnn.py, mmse.py,
noise_level_estimation.py}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key
from .base import Denoiser, Reconstructor
from .misc_models import ScoreModelWrapper as _ScoreModelWrapper
from ..utils.mixins import TimeMixin

__all__ = [
    "GSDRUNet",
    "EquivariantDenoiser",
    "TimeAgnosticNet",
    "TimeAveragingNet",
    "ComplexDenoiser",
    "to_complex_denoiser",
    "ICNN",
    "MMSE",
    "WaveletNoiseEstimator",
    "PatchCovarianceNoiseEstimator",
]


class GSDRUNet(Denoiser):
    r"""Gradient-step denoiser (reference GSPnP.py:19,147):
    ``D(x) = x - grad_x g(x)`` with potential
    ``g(x) = 0.5 ||x - N(x, sigma)||^2`` — exactly proximal when N has
    symmetric Jacobian. ``jax.grad`` replaces the reference's double
    autograd."""

    def __init__(self, student=None, alpha: float = 1.0, nb: int = 2,
                 act_mode: str = "E", pretrained=None, key=None, **kwargs):
        if student is None:
            from .drunet import DRUNet

            # reference GSDRUNet: ELU DRUNet with 2 blocks (GSPnP.py:123)
            student = DRUNet(nb=nb, act_mode=act_mode, key=key, **kwargs)
        self.student = student
        self.alpha = alpha
        if pretrained is not None:
            from .convert import load_torch_checkpoint, port_drunet

            sd = load_torch_checkpoint(pretrained)
            # GSDRUNet ckpts prefix the DRUNet under student_grad.model.
            prefix = "student_grad.model."
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}
            self.student = port_drunet(self.student, sd)

    def potential(self, x, sigma):
        n = self.student(x, sigma)
        return 0.5 * self.alpha * jnp.sum((x - n) ** 2)

    def __call__(self, x, sigma=0.05, **kwargs):
        g = jax.grad(lambda u: self.potential(u, sigma))(x)
        return x - g


class EquivariantDenoiser(Denoiser):
    r"""Monte-Carlo group-averaged denoiser (reference equivariant.py:186):
    ``D_eq(x) = mean_t t^{-1}(D(t(x)))``.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.models import EquivariantDenoiser, MedianFilter
        >>> from deepinv_tpu.transform import Rotate
        >>> den = EquivariantDenoiser(MedianFilter(),
        ...                           transform=Rotate(multiples=90, n_trans=2))
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 8, 8))
        >>> den(x, 0.1).shape
        (1, 1, 8, 8)
    """

    def __init__(self, denoiser, transform=None, random: bool = True, seed: int = 0):
        if transform is None:
            from ..transform import Rotate

            transform = Rotate(multiples=90)
        self.denoiser = denoiser
        self.transform = transform
        self.random = random
        self.seed = seed

    def __call__(self, x, sigma=0.05, key=None, **kwargs):
        key = ensure_key(key, self.seed)
        f = self.transform.symmetrize(lambda u: self.denoiser(u, sigma))
        return f(x, key=key)


class TimeAgnosticNet(Reconstructor, TimeMixin):
    r"""Apply a 2D network frame-by-frame to (B, C, T, H, W) data
    (reference dynamic.py:101 TimeAgnosticNet): flatten time into batch."""

    def __init__(self, backbone_net):
        self.backbone_net = backbone_net

    def __call__(self, y, physics=None, **kwargs):
        B, C, T, H, W = y.shape
        flat = jnp.moveaxis(y, 2, 1).reshape(B * T, C, H, W)
        out = self.backbone_net(flat, physics, **kwargs) if physics is not None else self.backbone_net(flat)
        return jnp.moveaxis(out.reshape(B, T, C, H, W), 1, 2)


class TimeAveragingNet(Reconstructor, TimeMixin):
    r"""Average the time dimension then apply a 2D network
    (reference dynamic.py TimeAveragingNet)."""

    def __init__(self, backbone_net):
        self.backbone_net = backbone_net

    def __call__(self, y, physics=None, **kwargs):
        mask = getattr(physics, "mask", None)
        if mask is not None and not isinstance(mask, float) and mask.ndim == y.ndim:
            num = jnp.sum(y * mask, axis=2)
            den = jnp.clip(jnp.sum(mask, axis=2), 1e-6, None)
            y2d = num / den
        else:
            y2d = jnp.mean(y, axis=2)
        return self.backbone_net(y2d, physics, **kwargs) if physics is not None else self.backbone_net(y2d)


class ComplexDenoiser(Denoiser):
    r"""Apply a real denoiser to stacked real/imaginary parts
    (reference complex.py:17)."""

    def __init__(self, denoiser, separate: bool = False):
        self.denoiser = denoiser
        self.separate = separate

    def __call__(self, x, sigma=0.05, **kwargs):
        if not jnp.iscomplexobj(x):
            return self.denoiser(x, sigma)
        re, im = jnp.real(x), jnp.imag(x)
        if self.separate:
            return self.denoiser(re, sigma) + 1j * self.denoiser(im, sigma)
        stacked = jnp.concatenate([re, im], axis=1)
        out = self.denoiser(stacked, sigma)
        C = x.shape[1]
        return out[:, :C] + 1j * out[:, C:]


def to_complex_denoiser(denoiser, **kwargs):
    return ComplexDenoiser(denoiser, **kwargs)


class ICNN(Module):
    r"""Input-convex neural network (reference icnn.py:181): non-negative
    weights on the hidden path guarantee convexity in x — usable as a
    learned Bregman potential."""

    def __init__(self, in_channels: int = 3, dim_hidden: int = 64, depth: int = 4, key=None):
        from .layers import Conv2d

        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 2 * depth + 2))
        self.w_x = [Conv2d(in_channels, dim_hidden, 3, 1, 1, key=next(ks)) for _ in range(depth)]
        self.w_z = [Conv2d(dim_hidden, dim_hidden, 3, 1, 1, bias=False, key=next(ks)) for _ in range(depth - 1)]
        self.final = Conv2d(dim_hidden, 1, 3, 1, 1, key=next(ks))

    def fn(self, x):
        z = jax.nn.softplus(self.w_x[0](x))
        for wx, wz in zip(self.w_x[1:], self.w_z):
            # convexity: non-negative (softplus-reparametrized) z-path weights
            z = jax.nn.softplus(wx(x) + _pos_conv(wz, z))
        out = _pos_conv_final(self.final, z)
        return jnp.sum(out.reshape(x.shape[0], -1), axis=1)

    def __call__(self, x):
        return self.fn(x)

    def grad(self, x):
        return jax.grad(lambda u: jnp.sum(self.fn(u)))(x)

    def initialize_weights(self, min_val=0.0, max_val=0.001, key=None):
        """Re-draw the convex-path weights uniformly in [min, max]
        (reference icnn.py:166); returns the updated module."""
        from ..core.rng import ensure_key

        key = ensure_key(key, 0)
        ks = jax.random.split(key, len(self.w_z) + 1)
        for i, wz in enumerate(self.w_z):
            self.w_z[i] = wz.replace(weight=min_val + (max_val - min_val)
                                     * jax.random.uniform(ks[i], wz.weight.shape))
        self.final = self.final.replace(
            weight=min_val + (max_val - min_val)
            * jax.random.uniform(ks[-1], self.final.weight.shape))
        return self

    def zero_clip_weights(self):
        """Clamp the convex-path weights to be non-negative (reference
        icnn.py:177); returns the updated module."""
        for i, wz in enumerate(self.w_z):
            self.w_z[i] = wz.replace(weight=jnp.clip(wz.weight, 0.0, None))
        self.final = self.final.replace(
            weight=jnp.clip(self.final.weight, 0.0, None))
        return self


def _pos_conv(conv, z):
    from jax import lax

    w = jax.nn.softplus(conv.weight)
    return lax.conv_general_dilated(
        z, w, (1, 1), [(conv.padding, conv.padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _pos_conv_final(conv, z):
    out = _pos_conv(conv, z)
    if conv.bias is not None:
        out = out + conv.bias[None, :, None, None]
    return out


class MMSE(Reconstructor):
    r"""Exact posterior mean over a finite signal set (reference mmse.py:277):
    ``E[x|y] = sum_i x_i p(y|x_i) / sum_i p(y|x_i)`` under Gaussian noise —
    the reference oracle for benchmarking learned reconstructors."""

    def __init__(self, dataset, sigma: float = 0.1):
        import numpy as np

        xs = jnp.asarray(np.stack([np.asarray(dataset[i]) for i in range(len(dataset))]))
        self.xs = xs
        self.sigma = sigma

    def __call__(self, y, physics, **kwargs):
        def log_lik(xi):
            r = physics.A(xi[None]) - y
            return -jnp.sum(jnp.abs(r) ** 2, axis=tuple(range(1, r.ndim))) / (
                2 * self.sigma**2
            )

        logs = jax.vmap(log_lik)(self.xs)  # (N, B)
        w = jax.nn.softmax(logs, axis=0)
        return jnp.tensordot(w.T, self.xs, axes=[[1], [0]])


class WaveletNoiseEstimator(Module):
    r"""Median-absolute-deviation noise estimate from finest wavelet details
    (reference noise_level_estimation.py)."""

    def __init__(self, wv: str = "db4"):
        from ..ops.wavelets import WaveletTransform

        self.wt = WaveletTransform(wavelet=wv, level=1)

    def estimate_noise(self, x):
        """MAD sigma estimate from the diagonal detail band (reference
        noise_level_estimation.py:58)."""
        t = self.wt.dwt2(x)
        hh = t["coeffs"][1][2]  # diagonal details
        mad = jnp.median(jnp.abs(hh.reshape(x.shape[0], -1)), axis=1)
        return mad / 0.6745

    def __call__(self, y, **kwargs):
        return self.estimate_noise(y)


class PatchCovarianceNoiseEstimator(Module):
    r"""Noise estimate from the smallest eigenvalues of patch covariances
    (reference noise_level_estimation.py:177)."""

    def __init__(self, patch_size: int = 8, stride: int = 4):
        self.patch_size = patch_size
        self.stride = stride

    def __call__(self, y, **kwargs):
        return self.estimate_noise(y)

    def estimate_noise(self, y):
        """Patch-covariance sigma estimate (reference
        noise_level_estimation.py:121)."""
        p, s = self.patch_size, self.stride
        B, C, H, W = y.shape
        patches = []
        for i in range(0, H - p + 1, s):
            for j in range(0, W - p + 1, s):
                patches.append(y[..., i : i + p, j : j + p].reshape(B, C * p * p))
        P = jnp.stack(patches, axis=1)  # (B, N, d)
        P = P - jnp.mean(P, axis=1, keepdims=True)
        cov = jnp.einsum("bnd,bne->bde", P, P) / (P.shape[1] - 1)
        eig = jnp.linalg.eigvalsh(cov)
        # median eigenvalue approximates the noise floor (signal occupies the
        # top of the spectrum; the MP bulk median is close to sigma^2)
        return jnp.sqrt(jnp.clip(jnp.median(eig, axis=1), 0.0, None))


class GSPnP(Denoiser):
    r"""Gradient-step denoiser wrapper for ANY denoiser architecture
    (reference GSPnP.py:19): ``D(x) = x - alpha * grad_x 0.5||x - N(x)||^2``,
    computed with ``jax.grad`` (the reference uses double autograd).
    :class:`GSDRUNet` is this wrapper specialized to DRUNet."""

    def __init__(self, denoiser, alpha: float = 1.0):
        self.student = denoiser
        self.alpha = alpha

    def potential(self, x, sigma):
        n = self.student(x, sigma)
        return 0.5 * self.alpha * jnp.sum((x - n) ** 2)

    def potential_grad(self, x, sigma):
        return jax.grad(lambda u: self.potential(u, sigma))(x)

    def __call__(self, x, sigma=0.05, **kwargs):
        return x - self.potential_grad(x, sigma)


def _transformed_physics(physics, transform, params):
    """Physics composed with a group action: ``A_g = A T_g`` and (for the
    orthogonal actions used here) ``A_g^T = T_g^{-1} A^T``. Built as a plain
    LinearPhysics so prox_l2/A_dagger go through the generic Krylov path
    with the *composed* operator (a forwarding proxy would silently reuse
    the base physics' decomposable shortcuts and break)."""
    from ..physics.base import LinearPhysics

    return LinearPhysics(
        A=lambda x: physics.A(transform.transform(x, **params)),
        A_adjoint=lambda y: transform.inverse(physics.A_adjoint(y), **params),
    )


class EquivariantReconstructor(Reconstructor):
    r"""Reynolds-averaged reconstructor (reference equivariant.py:98):
    ``R(y, A) = mean_g T_g Rtilde(y, A T_g)`` — exactly equivariant in the
    limit, Monte-Carlo estimated with ``transform.n_trans`` samples.

    :param model: base reconstructor ``Rtilde(y, physics)``.
    :param transform: group action (default: random 90-degree rotation).
    """

    def __init__(self, model, transform=None, seed: int = 0):
        if transform is None:
            from ..transform import Rotate

            transform = Rotate(multiples=90.0)
        self.model = model
        self.transform = transform
        self.seed = seed

    def __call__(self, y, physics, key=None, **kwargs):
        from ..core.rng import ensure_key

        key = ensure_key(key, self.seed)
        x0 = physics.A_adjoint(y)
        B = x0.shape[0]
        params = self.transform.get_params(x0, key)
        n = self.transform.n_trans
        out = 0.0
        for i in range(n):
            p_i = jax.tree_util.tree_map(lambda v: v[i * B : (i + 1) * B], params)
            phys_g = _transformed_physics(physics, self.transform, p_i)
            x_g = self.model(y, phys_g, **kwargs)
            out = out + self.transform.transform(x_g, **p_i)
        return out / n


class DiffusersDenoiserWrapper(_ScoreModelWrapper):
    """Adapter for HuggingFace ``diffusers`` UNets (reference
    wrapper.py:379 ``DiffusersDenoiserWrapper``). Construction requires the
    ``diffusers`` package and downloaded weights (no network egress here),
    so it raises with guidance; the schedule/score surface
    (``get_schedule_value``, ``time_from_sigma``, ``score``,
    ``stable_division``) is inherited from
    :class:`~deepinv_tpu.models.ScoreModelWrapper`, and the native
    :class:`deepinv_tpu.models.DiffUNet` family covers the same role."""

    def __init__(self, *args, **kwargs):
        raise ImportError(
            "DiffusersDenoiserWrapper requires the 'diffusers' package and "
            "downloaded pretrained weights (no network egress here). Use "
            "deepinv_tpu.models.DiffUNet / ADMUNet instead, or construct a "
            "ScoreModelWrapper around any native score network."
        )


ComplexDenoiserWrapper = ComplexDenoiser  # reference name alias
