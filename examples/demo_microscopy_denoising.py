"""Denoising fluorescence microscopy with the FMD dataset layout
(counterpart of reference examples/external-libraries/
demo_microscopy_denoising.py).

The Fluorescence Microscopy Denoising dataset pairs raw photon-limited
acquisitions with 50-frame averages (`gt/<fov>/avg50.png`). Our ``FMD``
loader implements the reference's exact directory pairing (fmd.py) — here
we fabricate a small on-disk FMD tree with synthetic confocal frames (no
download), load it, and denoise with Anscombe-stabilized wavelets.
"""

# make the repo root importable when run as `python examples/<demo>.py`
import os as _os
import sys as _sys
import tempfile

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import _util

_util.setup()  # CPU by default; DEEPINV_TPU_DEMO_PLATFORM overrides

import numpy as np
import jax.numpy as jnp

from deepinv_tpu.datasets import FMD, random_circles
from deepinv_tpu.models import AnscombeDenoiser, WaveletDenoiser
from deepinv_tpu.loss import PSNR


def fabricate_fmd(root, img_type="Confocal_BPAE_B", fovs=(1, 2), n_frames=2,
                  peak=30, seed=0):
    """Write an FMD-layout tree: <type>/{raw,avg2,...}/<fov>/*.png +
    <type>/gt/<fov>/avg50.png (reference fmd.py directory structure)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for fov in fovs:
        clean = random_circles(128, seed=100 + fov)[0]  # (H, W) in [0,1]
        gt_dir = _os.path.join(root, img_type, "gt", str(fov))
        _os.makedirs(gt_dir, exist_ok=True)
        Image.fromarray((clean * 255).astype(np.uint8)).save(
            _os.path.join(gt_dir, "avg50.png"))
        for level, dirname in [(1, "raw"), (2, "avg2")]:
            d = _os.path.join(root, img_type, dirname, str(fov))
            _os.makedirs(d, exist_ok=True)
            for i in range(n_frames):
                # photon shot noise, averaged over `level` frames
                frames = rng.poisson(clean * peak * level) / (peak * level)
                Image.fromarray(
                    (np.clip(frames, 0, 1) * 255).astype(np.uint8)
                ).save(_os.path.join(d, f"{i}.png"))


def main():
    with tempfile.TemporaryDirectory() as root:
        fabricate_fmd(root)
        to_arr = lambda im: jnp.asarray(np.asarray(im), jnp.float32)[None] / 255.0
        ds = FMD(root, img_types=["Confocal_BPAE_B"], noise_levels=(1, 2),
                 fovs=(1, 2), transform=to_arr, target_transform=to_arr)
        print(f"FMD loaded: {len(ds)} noisy frames "
              f"(2 fovs x 2 noise levels x 2 frames)")

        den = AnscombeDenoiser(WaveletDenoiser("db4", level=3), gain=1 / 30.0)
        psnr = PSNR()
        vals_in, vals_out = [], []
        for clean, noisy in ds:
            xhat = den(noisy[None], 0.6)
            vals_in.append(float(psnr(noisy[None], clean[None])[0]))
            vals_out.append(float(psnr(xhat, clean[None])[0]))
        print(f"mean PSNR noisy   : {np.mean(vals_in):6.2f} dB")
        print(f"mean PSNR denoised: {np.mean(vals_out):6.2f} dB "
              f"(Anscombe + db4 wavelets)")


if __name__ == "__main__":
    main()
