"""Synthetic phantoms (reference deepinv/utils/phantoms.py SheppLoganDataset
and tests/dummy.py DummyCircles) — no downloads needed for tests/demos."""

from __future__ import annotations

import numpy as np

__all__ = ["shepp_logan", "SheppLoganDataset", "random_circles"]

# (intensity, a, b, x0, y0, phi_deg) — standard Shepp-Logan ellipses
_ELLIPSES = [
    (1.0, 0.69, 0.92, 0.0, 0.0, 0),
    (-0.8, 0.6624, 0.874, 0.0, -0.0184, 0),
    (-0.2, 0.11, 0.31, 0.22, 0.0, -18),
    (-0.2, 0.16, 0.41, -0.22, 0.0, 18),
    (0.1, 0.21, 0.25, 0.0, 0.35, 0),
    (0.1, 0.046, 0.046, 0.0, 0.1, 0),
    (0.1, 0.046, 0.046, 0.0, -0.1, 0),
    (0.1, 0.046, 0.023, -0.08, -0.605, 0),
    (0.1, 0.023, 0.023, 0.0, -0.606, 0),
    (0.1, 0.023, 0.046, 0.06, -0.605, 0),
]


def shepp_logan(size: int = 128, dtype=np.float32) -> np.ndarray:
    """Shepp-Logan phantom of shape (size, size) in [0, 1]."""
    y, x = np.mgrid[-1 : 1 : size * 1j, -1 : 1 : size * 1j]
    img = np.zeros((size, size), dtype)
    for A, a, b, x0, y0, phi in _ELLIPSES:
        th = np.deg2rad(phi)
        xr = (x - x0) * np.cos(th) + (y - y0) * np.sin(th)
        yr = -(x - x0) * np.sin(th) + (y - y0) * np.cos(th)
        img += A * ((xr / a) ** 2 + (yr / b) ** 2 <= 1)
    img = np.clip(img, 0, 1)
    return img.astype(dtype)


def random_circles(size: int = 64, n_circles: int = 5, seed: int = 0, channels: int = 1):
    """Random circles image like the reference test dummy (tests/dummy.py:23)."""
    rng = np.random.RandomState(seed)
    img = np.zeros((channels, size, size), np.float32)
    y, x = np.mgrid[0:size, 0:size]
    for _ in range(n_circles):
        cx, cy = rng.randint(0, size, 2)
        r = rng.randint(size // 16, size // 4)
        val = rng.rand()
        mask = (x - cx) ** 2 + (y - cy) ** 2 <= r**2
        for c in range(channels):
            img[c][mask] = val
    return img


from .base import ImageDataset


class SheppLoganDataset(ImageDataset):
    """Dataset of randomly-deformed Shepp-Logan phantoms
    (reference utils/phantoms.py:319)."""

    def __init__(self, size: int = 128, length: int = 10, channels: int = 1, seed: int = 0):
        self.size = size
        self.length = length
        self.channels = channels
        self.seed = seed

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        base = shepp_logan(self.size)
        # random affine jitter: shift + intensity scaling per sample
        shift = rng.randint(-self.size // 16, self.size // 16 + 1, 2)
        img = np.roll(base, shift, axis=(0, 1)) * (0.8 + 0.4 * rng.rand())
        return np.repeat(img[None], self.channels, axis=0).astype(np.float32)
