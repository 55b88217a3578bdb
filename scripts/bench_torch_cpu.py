"""torch-CPU baselines for bench.py's `vs_baseline` fields.

Runs the PyTorch REFERENCE (/root/reference, deepinv v0.4.1) on this host's
CPU (8 torch threads) on the *identical* workloads bench.py times on the
TPU, and prints one JSON line per config. These are the denominators for
`vs_baseline` — measured, not assumed (BASELINE.md "A100-equivalence
derivation" explains the CPU→A100 conversion).

Configs (argv[1:], default: all):

- ``deblur_b8`` / ``mri_b8`` / ``ct_b8`` — the three recon configs at
  batch 8: reference optim_builder model, images/s = B × iters/s.
  (VERDICT r4 #1: the batched rows must compare against the torch CPU at
  the SAME batch.)
- ``train_b16`` — supervised DnCNN denoising train step at batch 16.
- ``sampling`` — DDRM (reference sampling/diffusion.py:83) + DRUNet on
  256px inpainting, steps/s (slope over schedule length).
- ``sampling_sr`` — DPS (diffusion.py:516) + DRUNet on 4x bicubic
  downsampling, steps/s (slope over num_steps).
- ``train_ssl`` — EI+SURE self-supervised step (loss/ei.py:13,
  loss/sure.py:122): DnCNN recon on inpainting, fwd+bwd+adam, steps/s.

The reference imports with the same torchvision/natsort/timm stubs the
namespace-parity test uses (tests/test_namespace_parity.py:_make_stubs).
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("DEEPINV_REFERENCE", "/root/reference")

sys.path.insert(0, os.path.join(REPO, "tests"))
from test_namespace_parity import _make_stubs  # noqa: E402

_stub_root = tempfile.mkdtemp(prefix="refstubs_")
_make_stubs(_stub_root)
sys.path.insert(0, _stub_root)
sys.path.insert(1, REFERENCE)

import numpy as np  # noqa: E402
import torch  # noqa: E402

torch.set_num_threads(int(os.environ.get("TORCH_THREADS", "8")))
torch.manual_seed(0)

# The namespace-parity stubs raise NotImplementedError for torchvision
# rotate; the EI loss times a real rotation, so install a genuine
# grid_sample-based rotate (what torchvision uses internally) BEFORE
# deepinv's `from torchvision.transforms.functional import rotate` binds it.
import torchvision.transforms.functional as _TF  # noqa: E402


def _real_rotate(img, angle, interpolation=None, expand=False, center=None,
                 fill=None):
    import math

    a = float(angle) * math.pi / 180.0
    cos, sin = math.cos(a), math.sin(a)
    x = img if img.dim() == 4 else img.unsqueeze(0)
    theta = torch.tensor([[cos, sin, 0.0], [-sin, cos, 0.0]], dtype=x.dtype)
    grid = torch.nn.functional.affine_grid(
        theta.unsqueeze(0).expand(x.shape[0], -1, -1), list(x.shape),
        align_corners=False)
    out = torch.nn.functional.grid_sample(
        x, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
    return out if img.dim() == 4 else out.squeeze(0)


_TF.rotate = _real_rotate

import deepinv as dinv  # noqa: E402


def _recon_problem(config, batch):
    if config == "deblur":
        shape = (batch, 3, 256, 256)
        x = torch.rand(shape)
        physics = dinv.physics.BlurFFT(
            img_size=shape[1:],
            filter=dinv.physics.blur.gaussian_blur(sigma=1.5),
            noise_model=dinv.physics.GaussianNoise(0.01),
        )
        den = dinv.models.DRUNet(pretrained=None)
        algo, params = "HQS", {"stepsize": 2.0, "g_param": 0.02}
    elif config == "mri":
        shape = (batch, 2, 256, 256)
        x = torch.randn(shape)
        mask = torch.from_numpy(
            (np.random.default_rng(0).random((256, 256)) < 0.3).astype(np.float32)
        )
        physics = dinv.physics.MRI(mask=mask, img_size=(256, 256))
        den = dinv.models.DnCNN(2, 2, pretrained=None)
        algo, params = "PGD", {"stepsize": 1.0, "g_param": 0.05}
    elif config == "ct":
        shape = (batch, 1, 256, 256)
        x = torch.rand(shape)
        physics = dinv.physics.Tomography(
            angles=90, img_width=256, normalize=True
        )
        den = dinv.models.DnCNN(1, 1, pretrained=None)
        algo, params = "PGD", {"stepsize": 1.0, "g_param": 0.05}
    else:
        raise ValueError(config)
    y = physics(x)
    return physics, y, den, algo, params


def _time_recon(config, batch, n_lo=1, n_hi=3, repeats=2):
    physics, y, den, algo, params = _recon_problem(config, batch)
    prior = dinv.optim.PnP(den)

    def run(n):
        m = dinv.optim.optim_builder(
            algo,
            data_fidelity=dinv.optim.L2(),
            prior=prior,
            params_algo=dict(params),
            max_iter=n,
            early_stop=False,
        )
        m.eval()
        with torch.no_grad():
            t = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                m(y, physics)
                t.append(time.perf_counter() - t0)
        return min(t)

    run(1)  # warm-up (allocator, thread pool)
    dt = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
    its = 1.0 / dt
    return {
        "metric": f"torch_cpu_{config}_b{batch}",
        "iters_per_sec": round(its, 4),
        "images_per_sec": round(its * batch, 4),
        "batch": batch,
        "threads": torch.get_num_threads(),
    }


def _time_train(batch, steps=3):
    den = dinv.models.DnCNN(1, 1, pretrained=None)
    x = torch.rand(batch, 1, 256, 256)
    y = x + 0.1 * torch.randn_like(x)
    opt = torch.optim.Adam(den.parameters(), lr=1e-4)
    mse = torch.nn.MSELoss()

    def step():
        opt.zero_grad()
        loss = mse(den(y, sigma=0.1), x)
        loss.backward()
        opt.step()

    step()  # warm-up
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return {
        "metric": f"torch_cpu_train_b{batch}",
        "steps_per_sec": round(1.0 / dt, 4),
        "images_per_sec": round(batch / dt, 4),
        "batch": batch,
        "threads": torch.get_num_threads(),
    }


def _time_sampling(n_lo=3, n_hi=9, repeats=2):
    """DDRM steps/s: slope over the schedule length."""
    shape = (1, 3, 256, 256)
    x = torch.rand(shape)
    physics = dinv.physics.Inpainting(
        img_size=shape[1:], mask=0.7,
        noise_model=dinv.physics.GaussianNoise(0.05),
    )
    y = physics(x)
    den = dinv.models.DRUNet(pretrained=None)

    def run(n):
        m = dinv.sampling.DDRM(denoiser=den, sigmas=np.linspace(1, 0, n + 1))
        with torch.no_grad():
            t = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                m(y, physics)
                t.append(time.perf_counter() - t0)
        return min(t)

    run(n_lo)
    dt = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
    return {
        "metric": "torch_cpu_sampling_ddrm",
        "steps_per_sec": round(1.0 / dt, 4),
        "threads": torch.get_num_threads(),
    }


def _time_sampling_sr(n_lo=3, n_hi=9, repeats=2):
    """DPS steps/s: slope over num_steps (each step backprops through the
    denoiser)."""
    shape = (1, 3, 256, 256)
    x = torch.rand(shape)
    physics = dinv.physics.Downsampling(
        img_size=shape[1:], filter="bicubic", factor=4,
        noise_model=dinv.physics.GaussianNoise(0.05),
    )
    y = physics(x)
    den = dinv.models.DRUNet(pretrained=None)

    def run(n):
        m = dinv.sampling.DPS(den, num_steps=n)
        t = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            m(y, physics)
            t.append(time.perf_counter() - t0)
        return min(t)

    run(n_lo)
    dt = (run(n_hi) - run(n_lo)) / (n_hi - n_lo)
    return {
        "metric": "torch_cpu_sampling_dps",
        "steps_per_sec": round(1.0 / dt, 4),
        "threads": torch.get_num_threads(),
    }


def _time_train_ssl(steps=3):
    """EI + SURE self-supervised step, matching bench.py's _run_train_ssl_config."""
    sigma_n = 0.1
    shape = (1, 1, 256, 256)
    physics = dinv.physics.Inpainting(
        img_size=shape[1:], mask=0.7,
        noise_model=dinv.physics.GaussianNoise(sigma_n),
    )
    x = torch.rand(shape)
    y = physics(x)
    den = dinv.models.DnCNN(1, 1, pretrained=None)

    class Recon(torch.nn.Module):
        def __init__(self, d):
            super().__init__()
            self.d = d

        def forward(self, yv, ph):
            return self.d(ph.A_adjoint(yv), sigma=sigma_n)

    model = Recon(den)
    sure = dinv.loss.SureGaussianLoss(sigma=sigma_n)
    ei = dinv.loss.EILoss(dinv.transform.Rotate())
    opt = torch.optim.Adam(den.parameters(), lr=1e-4)

    def step():
        opt.zero_grad()
        x_net = model(y, physics)
        loss = sure(y=y, x_net=x_net, physics=physics, model=model).mean()
        loss = loss + ei(x_net=x_net, physics=physics, model=model).mean()
        loss.backward()
        opt.step()

    step()  # warm-up
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return {
        "metric": "torch_cpu_train_ssl_ei_sure",
        "steps_per_sec": round(1.0 / dt, 4),
        "threads": torch.get_num_threads(),
    }


RUNNERS = {
    "deblur_b8": lambda: _time_recon("deblur", 8),
    "mri_b8": lambda: _time_recon("mri", 8),
    "ct_b8": lambda: _time_recon("ct", 8),
    "train_b16": lambda: _time_train(16),
    "sampling": _time_sampling,
    "sampling_sr": _time_sampling_sr,
    "train_ssl": _time_train_ssl,
}


def main():
    sel = sys.argv[1:] or list(RUNNERS)
    for name in sel:
        row = RUNNERS[name]()
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
