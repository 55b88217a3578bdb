"""Benchmark: reconstruction iteration throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configs (select with ``BENCH_CONFIG``, default ``deblur``):

- ``deblur`` — BASELINE.md config #1: PnP-HQS, BlurFFT + DRUNet, 1x3x256x256.
  One iteration = closed-form FFT prox + DRUNet forward, whole recon is a
  single ``lax.scan`` XLA program.
- ``mri``   — config #2: PnP-PGD, masked-FFT MRI (30% mask) + DnCNN,
  1x2x256x256 (the unrolled-MoDL iteration shape).
- ``ct``    — config #3: PnP-PGD, Tomography (90 angles, 256px, Fourier-
  slice NUFFT projector; the data-fidelity gradient runs through the
  Toeplitz-embedded normal operator) + DnCNN.

``vs_baseline`` divides by the PyTorch reference running the IDENTICAL
workload on this host's CPU with 8 torch threads (measured 2026-08-16):
deblur 0.385 it/s, mri 1.272 it/s, ct 0.726 it/s. The north-star target is
5x an A100 running the torch reference; an A100 runs these workloads at
roughly 100x the CPU figures, so vs_baseline > ~500 clears that bar.

Timing is slope-based (marginal cost per iteration between an N-iteration
and 4N-iteration program, min over repeats, outputs forced to host) because
the axon tunnel adds ~40-70 ms of dispatch noise per call. N is sized so
the long program runs ~1 s of device compute, amortizing that noise to <2%.

Each line also carries the self-verifying efficiency evidence (VERDICT r2
next-step #1a): ``model_flops`` / ``bytes_per_iter`` from XLA's own cost
analysis of the compiled iteration, and the derived ``mfu`` /
``hbm_util_bound`` against the attached chip's peak (device-kind table
below). Two honesty caveats baked into the field semantics:

- ``mfu`` is always computed against the **bf16 MXU peak**, including on
  the f32 cross-check row: JAX's DEFAULT precision on TPU multiplies f32
  convolutions in bf16 (only accumulation/storage change), so the f32
  program's matmul throughput ceiling is still the bf16 peak — dividing by
  the 4x-lower pure-f32 peak would report an impossible mfu>1.
- ``hbm_util_bound`` is an UPPER bound, not a utilization: XLA cost
  analysis counts bytes per op before fusion, so gather-heavy programs
  (the CT projector) can report >1. Values near/below ~0.9 are meaningful
  (the deblur roofline in BASELINE.md is corroborated by real traffic
  measurements); values >1 just mean the cost model overcounts.
- fused Pallas kernels are opaque to XLA's cost analysis (it reports ~0
  flops for a ``pallas_call``), so the kernel wrappers inject analytically
  counted flops/bytes at trace time (utils/profiling.record_pallas_cost);
  ``model_flops``/``bytes_per_iter`` include them and the Pallas share is
  broken out as ``pallas_flops``/``pallas_bytes`` (VERDICT r3 next-step #2a).

Set ``BENCH_F32=0`` to skip the f32 cross-check row for the headline
config (VERDICT r2 next-step #10).
"""

import json
import os
import time

import jax

# Persistent compilation cache: the three configs compile 6 XLA programs
# (~8 min cold over the remote-compile tunnel); a warm cache cuts the whole
# bench to well under a minute. Safe no-op if the backend doesn't support it.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from deepinv_tpu.physics import BlurFFT, GaussianNoise, MRI, Tomography
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import optim_builder, L2, PnP
from deepinv_tpu.models import DRUNet, DnCNN

N_ITER = int(os.environ.get("BENCH_N_ITER", "48"))

# Per-chip peaks for MFU / HBM-utilization evidence, keyed by
# jax.devices()[0].device_kind. v5e: 197 TF/s bf16 (394 int8); HBM
# 819 GB/s (public TPU v5e spec).
CHIP_PEAKS = {
    "TPU v5 lite": {"bf16_flops": 197e12, "hbm_gbps": 819e9},
    "TPU v5e": {"bf16_flops": 197e12, "hbm_gbps": 819e9},
}

CONFIGS = {
    "deblur": dict(torch_cpu_its=0.385,
                   metric="pnp_hqs_drunet_deblur_256px_iters_per_sec_chip"),
    "mri": dict(torch_cpu_its=1.272,
                metric="pnp_pgd_dncnn_mri_256px_iters_per_sec_chip"),
    "ct": dict(torch_cpu_its=0.726,
               metric="pnp_pgd_dncnn_ct90_256px_iters_per_sec_chip"),
    # Trainer hot loop (reference trainer.py:823-886): DnCNN denoising
    # fwd+bwd+adam at 1x1x256x256. torch-CPU reference measured in-tree
    # 2026-08-19 (8 threads, reference DnCNN, torch.optim.Adam, MSE):
    # 3335.5 ms/step = 0.2998 steps/s.
    "train": dict(torch_cpu_its=0.2998,
                  metric="train_dncnn_denoise_256px_steps_per_sec_chip"),
}


def _problem(config, key):
    if config == "deblur":
        shape = (1, 3, 256, 256)
        x = jax.jit(lambda k: jax.random.uniform(k, shape))(key)
        physics = BlurFFT(img_size=shape[1:], filter=gaussian_blur(sigma=1.5),
                          noise_model=GaussianNoise(0.01))
        y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))
        denoiser = DRUNet(pretrained=None)  # standard nc=(64,128,256,512), nb=4
        algo, params = "HQS", {"stepsize": 2.0, "g_param": 0.02}
    elif config == "mri":
        shape = (1, 2, 256, 256)
        x = jax.jit(lambda k: jax.random.normal(k, shape))(key)
        import numpy as np

        mask = jnp.asarray(
            (np.random.default_rng(0).random((256, 256)) < 0.3).astype(np.float32)
        )
        physics = MRI(mask=mask, img_size=(256, 256))
        y = jax.jit(lambda p, v: p.A(v))(physics, x)
        denoiser = DnCNN(2, 2, pretrained=None)
        algo, params = "PGD", {"stepsize": 1.0, "g_param": 0.05}
    elif config == "ct":
        shape = (1, 1, 256, 256)
        x = jax.jit(lambda k: jax.random.uniform(k, shape))(key)
        # normalize=True scales A by 1/W so ||A||<1 and stepsize 1.0 is
        # stable (identical FLOPs; the unnormalized operator has ||A||~86
        # and PGD at stepsize 1 diverges - timing a NaN program is cheating)
        physics = Tomography(img_width=256, angles=90, method="slice",
                             normalize=True)
        y = jax.jit(lambda p, v: p.A(v))(physics, x)
        denoiser = DnCNN(1, 1, pretrained=None)
        algo, params = "PGD", {"stepsize": 1.0, "g_param": 0.05}
    else:
        raise ValueError(f"unknown BENCH_CONFIG {config!r}")
    # bf16 denoiser compute by default (f32 accumulation + f32 prox): the
    # TPU-native analogue of the A100 torch reference's default TF32 convs.
    # Quality parity is asserted in tests/test_models.py
    # (test_autocast_bf16_parity). Set BENCH_DTYPE=f32 to disable.
    if os.environ.get("BENCH_DTYPE", "bf16") == "bf16":
        from deepinv_tpu.models import autocast

        denoiser = autocast(denoiser)
    return physics, y, denoiser, algo, params


def _iter_cost(physics, y, denoiser, algo, params):
    """XLA cost analysis of ONE optimization iteration (flops + bytes).

    XLA's cost analysis counts a ``lax.scan`` body once regardless of trip
    count (measured: max_iter=2 and max_iter=8 report identical flops), so
    the max_iter=1 program IS the per-iteration cost, up to the one-off
    ``A_adjoint(y)`` initialization (<1% of the denoiser's flops here).
    """
    from deepinv_tpu.utils.profiling import compiled_cost

    m0 = optim_builder(algo, data_fidelity=L2(), prior=PnP(denoiser),
                       params_algo=params, max_iter=1)
    try:
        c0 = compiled_cost(lambda mm, yv, p: mm(yv, p), m0, y, physics)
        return {"flops": c0.get("flops", 0.0),
                "bytes": c0.get("bytes accessed", 0.0),
                "pallas_flops": c0.get("pallas_flops", 0.0),
                "pallas_bytes": c0.get("pallas_bytes", 0.0)}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0, "pallas_flops": 0.0,
                "pallas_bytes": 0.0}


def _run_train_config(dtype=None):
    """Training-step throughput (VERDICT r3 next-step #3): DnCNN denoising
    fwd+bwd+adam, slope-timed over a `lax.scan` of whole train steps with
    the (model, opt_state) pytree as carry — the Trainer's jitted hot loop
    without dataloader overhead."""
    import numpy as np
    import optax

    meta = CONFIGS["train"]
    if dtype is not None:
        os.environ["BENCH_DTYPE"] = dtype
    dtype = os.environ.get("BENCH_DTYPE", "bf16")

    den = DnCNN(1, 1, pretrained=None)
    kx, kn = jax.random.split(jax.random.key(0))
    x = jax.jit(lambda k: jax.random.uniform(k, (1, 1, 256, 256)))(kx)
    y = x + 0.1 * jax.random.normal(kn, x.shape)
    opt = optax.adam(1e-4)

    def net(m, v):
        if dtype == "bf16":
            from deepinv_tpu.models import autocast

            return autocast(m)(v, 0.1)
        return m(v, 0.1)

    def loss_fn(m, xv, yv):
        out = net(m, yv)
        return jnp.mean((out.astype(jnp.float32) - xv) ** 2)

    def step(carry, _):
        from deepinv_tpu.ops.pallas.conv_chain import fused_chains_disabled

        m, os_ = carry
        # like the Trainer: trace the pure-XLA path under grad (the fused
        # inference kernels lose under autodiff — bench_train_chain.py)
        with fused_chains_disabled():
            _, grads = jax.value_and_grad(loss_fn)(m, x, y)
        updates, os_ = opt.update(grads, os_, m)
        m = optax.apply_updates(m, updates)
        return (m, os_), None

    def build(iters):
        f = jax.jit(lambda m, s: jax.lax.scan(step, (m, s), None,
                                              length=iters)[0])
        s0 = opt.init(den)
        out = f(den, s0)
        _ = np.asarray(jax.device_get(
            jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            o = f(den, s0)
            _ = np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(o)[0])).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    n = max(N_ITER // 4, 8)
    t_short = build(n)
    t_long = build(4 * n)
    dt = (t_long - t_short) / (3 * n)
    its = 1.0 / dt
    row = {
        "metric": meta["metric"] + ("" if dtype == "bf16" else f"_{dtype}"),
        "value": round(its, 2),
        "unit": "step/s",
        "vs_baseline": round(its / meta["torch_cpu_its"], 2),
    }
    from deepinv_tpu.utils.profiling import compiled_cost

    try:
        c = compiled_cost(
            lambda m, s: step((m, s), None)[0], den, opt.init(den))
        peaks = CHIP_PEAKS.get(jax.devices()[0].device_kind)
        if c.get("flops", 0) > 0:
            row["model_flops"] = round(c["flops"] / 1e9, 2)
            row["bytes_per_iter"] = round(c.get("bytes accessed", 0) / 1e6, 1)
            if c.get("pallas_flops", 0) > 0:
                row["pallas_flops"] = round(c["pallas_flops"] / 1e9, 2)
                row["pallas_bytes"] = round(c["pallas_bytes"] / 1e6, 1)
            if peaks:
                row["mfu"] = round(c["flops"] * its / peaks["bf16_flops"], 3)
                row["hbm_util_bound"] = round(
                    c.get("bytes accessed", 0) * its / peaks["hbm_gbps"], 3)
    except Exception:
        pass
    return row


def _run_config(config, dtype=None):
    if config == "train":
        return _run_train_config(dtype)
    meta = CONFIGS[config]
    if dtype is not None:
        os.environ["BENCH_DTYPE"] = dtype
    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    physics, y, denoiser, algo, params = _problem(config, jax.random.key(0))

    import numpy as np

    def build(iters):
        m = optim_builder(
            algo, data_fidelity=L2(), prior=PnP(denoiser),
            params_algo=params, max_iter=iters,
        )
        f = jax.jit(lambda mm, yv, p: mm(yv, p))
        _ = np.asarray(jax.device_get(f(m, y, physics))).ravel()[:1]

        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            o = f(m, y, physics)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_short = build(N_ITER)
    t_long = build(N_ITER * 4)
    dt = (t_long - t_short) / (N_ITER * 3)

    its = 1.0 / dt
    row = {
        "metric": meta["metric"] + ("" if dtype == "bf16" else f"_{dtype}"),
        "value": round(its, 2),
        "unit": "iter/s",
        "vs_baseline": round(its / meta["torch_cpu_its"], 2),
    }

    cost = _iter_cost(physics, y, denoiser, algo, params)
    peaks = CHIP_PEAKS.get(jax.devices()[0].device_kind)
    if cost["flops"] > 0:
        row["model_flops"] = round(cost["flops"] / 1e9, 2)  # GF / iter
        row["bytes_per_iter"] = round(cost["bytes"] / 1e6, 1)  # MB / iter
        if cost["pallas_flops"] > 0:
            # share contributed by fused Pallas kernels (opaque to XLA's
            # cost model; analytically counted by the kernel wrappers —
            # utils/profiling.record_pallas_cost)
            row["pallas_flops"] = round(cost["pallas_flops"] / 1e9, 2)
            row["pallas_bytes"] = round(cost["pallas_bytes"] / 1e6, 1)
        if peaks:
            # bf16 peak even for the f32 row: TPU DEFAULT precision
            # multiplies f32 convs in bf16 (see module docstring).
            row["mfu"] = round(cost["flops"] * its / peaks["bf16_flops"], 3)
            row["hbm_util_bound"] = round(
                cost["bytes"] * its / peaks["hbm_gbps"], 3)
    return row


def main():
    # BENCH_CONFIG selects one config; default runs all three so the driver
    # captures MRI and CT evidence too. One JSON line per config; the
    # headline (deblur) prints LAST because the driver parses the tail. An
    # f32 cross-check row for the headline config (BENCH_F32=0 to skip)
    # guards against bf16-only numerics drift going unnoticed on TPU.
    sel = os.environ.get("BENCH_CONFIG")
    configs = [sel] if sel else ["mri", "ct", "train", "deblur"]
    for config in configs:
        if (config == "deblur" and not sel
                and os.environ.get("BENCH_F32", "1") == "1"):
            print(json.dumps(_run_config(config, dtype="f32")), flush=True)
            print(json.dumps(_run_config(config, dtype="bf16")), flush=True)
        else:
            print(json.dumps(_run_config(config)), flush=True)


if __name__ == "__main__":
    main()
