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
    # BASELINE.json config #4 — diffusion posterior sampling. DDRM (reference
    # sampling/diffusion.py:83) with a DRUNet denoiser on 256px inpainting,
    # and DPS (diffusion.py:516) on 4x super-resolution. Units are denoiser
    # steps/s/chip; the whole sampler is ONE lax.scan program, slope-timed
    # by varying the schedule length. torch-CPU references measured in-tree
    # 2026-08-20 (scripts/bench_torch_cpu.py, 8 threads).
    "sampling": dict(torch_cpu_its=0.3918,
                     metric="ddrm_drunet_inpainting_256px_steps_per_sec_chip"),
    "sampling_sr": dict(torch_cpu_its=0.2045,
                        metric="dps_drunet_sr4_256px_steps_per_sec_chip"),
    # BASELINE.json config #5 — self-supervised EI + SURE training step
    # (reference loss/ei.py:13, loss/sure.py:122): DnCNN reconstructor on
    # 256px inpainting, loss = SURE(y) + EI(rotations), fwd+bwd+adam.
    "train_ssl": dict(
        torch_cpu_its=0.1214,
        metric="train_ssl_ei_sure_dncnn_inpainting_256px_steps_per_sec_chip"),
}

# torch-CPU throughput at batch (images/s, 8 threads) for the batched rows'
# vs_baseline: measured by scripts/bench_torch_cpu.py on this host
# (2026-08-20). The CPU is compute-bound on these workloads, so images/s is
# nearly flat in batch — deblur 0.333 img/s at B=8 vs 0.385 at B=1, train
# 0.177 at B=16 vs 0.300 at B=1 (slightly WORSE per image at batch: the
# 8-thread CPU gains nothing from batching and loses cache locality).
# Keys: (config, batch) -> images/s.
TORCH_CPU_IMGS = {
    ("deblur", 8): 0.3326,
    ("mri", 8): 1.0507,
    ("ct", 8): 0.5912,
    ("train", 16): 0.1772,
}


def _problem(config, key, batch=1):
    if config == "deblur":
        shape = (batch, 3, 256, 256)
        x = jax.jit(lambda k: jax.random.uniform(k, shape))(key)
        physics = BlurFFT(img_size=shape[1:], filter=gaussian_blur(sigma=1.5),
                          noise_model=GaussianNoise(0.01))
        y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))
        denoiser = DRUNet(pretrained=None)  # standard nc=(64,128,256,512), nb=4
        algo, params = "HQS", {"stepsize": 2.0, "g_param": 0.02}
    elif config == "mri":
        shape = (batch, 2, 256, 256)
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
        shape = (batch, 1, 256, 256)
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


def _toeplitz_normal_correction(physics, x):
    """Analytic-minus-XLA cost correction for the Toeplitz normal op.

    XLA's cost analysis models an ``fft`` HLO as O(n^2)-ish bytes, so the
    CT row's ``bytes_per_iter`` was a meaningless 13.7 GB and
    ``hbm_util_bound`` 9.2 (VERDICT r4 weak #6). Fix: compile the isolated
    ``A_adjoint_A`` (the only per-iteration FFT site in the PGD program —
    ``A_adjoint(y)`` is hoisted as loop-invariant), subtract XLA's count
    for it, and add the analytic count: per channel the op is pad →
    ``fft2`` (Gn x Gn complex64) → pointwise multiply by the precomputed
    spectrum → ``ifft2`` → crop (ops/nufft.py:160). FLOPs: 5 N log2 N per
    complex FFT of total size N = Gn^2 (+6N for the multiply); bytes: each
    of the 5 phases reads and writes the Gn^2 c64 array once (+ the f32
    pad/crop endpoints + the spectrum read) — an upper bound on real HBM
    traffic since XLA fuses pad/mul/crop into neighbors.

    Returns ``(flops_delta, bytes_delta)`` to ADD to the full-program cost.
    """
    import math

    from deepinv_tpu.utils.profiling import compiled_cost

    spec = getattr(physics, "_normal_spec", None)
    if spec is None:
        return 0.0, 0.0
    c_nop = compiled_cost(lambda p, v: p.A_adjoint_A(v), physics, x)
    bc = 1
    for d in x.shape[:-2]:
        bc *= d
    g = spec.shape[-2] * spec.shape[-1]
    n_img = x.shape[-2] * x.shape[-1]
    ana_flops = bc * (2 * 5.0 * g * math.log2(g) + 6.0 * g)
    ana_bytes = bc * (10.0 * g * 8.0 + 2 * n_img * 4.0) + g * 8.0
    return (ana_flops - c_nop.get("flops", 0.0),
            ana_bytes - c_nop.get("bytes accessed", 0.0))


def _iter_cost(physics, y, denoiser, algo, params):
    """XLA cost analysis of ONE optimization iteration (flops + bytes).

    XLA's cost analysis counts a ``lax.scan`` body once regardless of trip
    count (measured: max_iter=2 and max_iter=8 report identical flops), so
    the max_iter=1 program IS the per-iteration cost, up to the one-off
    ``A_adjoint(y)`` initialization (<1% of the denoiser's flops here).

    When the physics has a Toeplitz fast normal op, its FFT phases are
    re-counted analytically (see :func:`_toeplitz_normal_correction`).
    """
    from deepinv_tpu.utils.profiling import compiled_cost

    m0 = optim_builder(algo, data_fidelity=L2(), prior=PnP(denoiser),
                       params_algo=params, max_iter=1)
    try:
        c0 = compiled_cost(lambda mm, yv, p: mm(yv, p), m0, y, physics)
        flops, bytes_ = c0.get("flops", 0.0), c0.get("bytes accessed", 0.0)
        if getattr(physics, "fast_normal", False):
            # the A_adjoint(y) initialization is loop-invariant (hoisted
            # out of the scan; the in-loop gradient runs through the
            # Toeplitz normal op) but XLA counts it once into the program
            # cost — and the TPU cost model prices the Radon adjoint's
            # sorted segment-sum scatter at ~13 GB (measured in isolation
            # 2026-08-20: A_adjoint alone 13,209 MB / 4.84 GF vs the full
            # iteration's 13,658 MB). Subtract the isolated init program
            # so the row reports PER-ITERATION cost (VERDICT r4 #6).
            c_init = compiled_cost(lambda p, yv: p.A_adjoint(yv), physics, y)
            flops = max(flops - c_init.get("flops", 0.0), 0.0)
            bytes_ = max(bytes_ - c_init.get("bytes accessed", 0.0), 0.0)
            # shape-only probe (eager A_adjoint would run FFTs outside jit,
            # which the axon TPU path does not support)
            w = physics.img_width
            x_like = jnp.zeros(y.shape[:2] + (w, w), y.dtype)
            df, db = _toeplitz_normal_correction(physics, x_like)
            flops, bytes_ = flops + df, bytes_ + db
        return {"flops": flops,
                "bytes": bytes_,
                "pallas_flops": c0.get("pallas_flops", 0.0),
                "pallas_bytes": c0.get("pallas_bytes", 0.0)}
    except Exception:
        return {"flops": 0.0, "bytes": 0.0, "pallas_flops": 0.0,
                "pallas_bytes": 0.0}


def _run_train_config(dtype=None, batch=1):
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
    x = jax.jit(lambda k: jax.random.uniform(k, (batch, 1, 256, 256)))(kx)
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

    n = max(max(N_ITER // 4, 8) // max(1, batch // 4), 6)
    t_short = build(n)
    t_long = build(4 * n)
    dt = (t_long - t_short) / (3 * n)
    its = 1.0 / dt
    suffix = ("" if dtype == "bf16" else f"_{dtype}") + (
        f"_b{batch}" if batch > 1 else "")
    row = {
        "metric": meta["metric"] + suffix,
        "value": round(its, 2),
        "unit": "step/s",
    }
    if batch > 1:
        row["batch"] = batch
        row["images_per_sec"] = round(its * batch, 2)
        cpu = TORCH_CPU_IMGS.get(("train", batch), meta["torch_cpu_its"])
        row["vs_baseline"] = round(its * batch / cpu, 2)
    else:
        row["vs_baseline"] = round(its / meta["torch_cpu_its"], 2)
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


def _timed_slope(make_runner, n_short, n_long, repeats=6):
    """min-of-repeats wall time for an n-step program at two sizes; returns
    marginal seconds/step (the slope cancels dispatch noise + fixed phases).

    ``make_runner(n)`` must return a ZERO-ARG callable that runs the
    n-step program; construction (model build + ``jax.jit`` wrapper) happens
    once outside the timed region. (The r5 first cut rebuilt the jit
    wrapper per repeat, so every 'timing' paid trace+lowering — the DDRM
    row came out NEGATIVE. Never time through a fresh ``jax.jit``.)"""
    import numpy as np

    def t(n):
        run = make_runner(n)
        out = run()  # warm-up/compile
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])
                       ).ravel()[:1]
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            o = run()
            _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0])
                           ).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t(n_long) - t(n_short)) / (n_long - n_short)


def _run_sampling_config(config, dtype=None, batch=1):
    """BASELINE.json config #4 — diffusion posterior sampling throughput.

    ``sampling``: DDRM (reference sampling/diffusion.py:83) on 256px RGB
    inpainting (70% kept, sigma 0.05) with a DRUNet denoiser — one denoiser
    eval per step, the whole sampler one ``lax.scan`` program.
    ``sampling_sr``: DPS (reference diffusion.py:516) on 4x bicubic
    super-resolution — each step differentiates through the denoiser
    (~3x forward cost).

    Steps/s/chip, slope-timed by varying the schedule length so init/final
    phases cancel.
    """
    import numpy as np

    meta = CONFIGS[config]
    if dtype is not None:
        os.environ["BENCH_DTYPE"] = dtype
    dtype = os.environ.get("BENCH_DTYPE", "bf16")

    from deepinv_tpu.physics import Downsampling, Inpainting
    from deepinv_tpu.sampling import DDRM, DPS

    shape = (batch, 3, 256, 256)
    x = jax.jit(lambda k: jax.random.uniform(k, shape))(jax.random.key(0))
    den = DRUNet(pretrained=None)
    if dtype == "bf16":
        from deepinv_tpu.models import autocast

        den = autocast(den)

    if config == "sampling":
        physics = Inpainting(img_size=shape[1:], mask=0.7,
                             key=jax.random.key(5),
                             noise_model=GaussianNoise(0.05))
        y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))

        def make_runner(n):
            m = DDRM(den, sigmas=np.linspace(1, 0, n + 1))
            f = jax.jit(lambda mm, yv, p, k: mm(yv, p, key=k))
            return lambda: f(m, y, physics, jax.random.key(2))
    else:
        physics = Downsampling(img_size=shape[1:], filter="bicubic", factor=4,
                               noise_model=GaussianNoise(0.05))
        y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))

        def make_runner(n):
            m = DPS(den, max_iter=n)
            f = jax.jit(lambda mm, yv, p, k: mm(yv, p, key=k))
            return lambda: f(m, y, physics, jax.random.key(2))

    n_short = max(max(N_ITER // 4, 8) // max(1, batch // 2), 6)
    dt = _timed_slope(make_runner, n_short, 4 * n_short)
    its = 1.0 / dt
    row = {
        "metric": meta["metric"]
        + ("" if dtype == "bf16" else f"_{dtype}")
        + (f"_b{batch}" if batch > 1 else ""),
        "value": round(its, 2),
        "unit": "step/s",
    }
    if batch > 1:
        row["batch"] = batch
        row["images_per_sec"] = round(its * batch, 2)
        row["vs_baseline"] = round(its * batch / meta["torch_cpu_its"], 2)
    elif meta["torch_cpu_its"]:
        row["vs_baseline"] = round(its / meta["torch_cpu_its"], 2)
    # analytic per-step cost: one scan body (DDRM: 1 denoiser fwd; DPS: fwd
    # + vjp through denoiser and physics)
    try:
        from deepinv_tpu.utils.profiling import compiled_cost

        if config == "sampling":
            c = compiled_cost(lambda m, v: m(v, jnp.asarray(0.1)), den, x)
        else:
            c = compiled_cost(
                lambda m, v: jax.grad(
                    lambda u: jnp.sum(m(u, jnp.asarray(0.1)) ** 2))(v),
                den, x)
        peaks = CHIP_PEAKS.get(jax.devices()[0].device_kind)
        if c.get("flops", 0) > 0:
            row["model_flops"] = round(
                (c["flops"] + c.get("pallas_flops", 0.0)) / 1e9, 2)
            row["bytes_per_iter"] = round(
                (c.get("bytes accessed", 0)
                 + c.get("pallas_bytes", 0.0)) / 1e6, 1)
            if peaks:
                row["mfu"] = round(
                    (c["flops"] + c.get("pallas_flops", 0.0)) * its
                    / peaks["bf16_flops"], 3)
                row["hbm_util_bound"] = round(
                    (c.get("bytes accessed", 0) + c.get("pallas_bytes", 0.0))
                    * its / peaks["hbm_gbps"], 3)
    except Exception:
        pass
    return row


def _run_train_ssl_config(dtype=None, batch=1):
    """BASELINE.json config #5 — self-supervised EI + SURE training
    (reference loss/ei.py:13 + loss/sure.py:122): DnCNN reconstructor
    ``x = f(A^T y)`` on 256px inpainting; loss = SURE (Hutchinson jvp
    through physics∘model) + EI over random rotations; fwd+bwd+adam,
    slope-timed over a ``lax.scan`` of whole steps."""
    import numpy as np
    import optax

    meta = CONFIGS["train_ssl"]
    if dtype is not None:
        os.environ["BENCH_DTYPE"] = dtype
    dtype = os.environ.get("BENCH_DTYPE", "bf16")

    from deepinv_tpu.physics import Inpainting
    from deepinv_tpu.loss import EILoss, SureGaussianLoss
    from deepinv_tpu.transform import Rotate

    sigma_n = 0.1
    shape = (batch, 1, 256, 256)
    physics = Inpainting(img_size=shape[1:], mask=0.7, key=jax.random.key(5),
                         noise_model=GaussianNoise(sigma_n))
    x = jax.jit(lambda k: jax.random.uniform(k, shape))(jax.random.key(0))
    y = jax.jit(lambda p, v, k: p(v, key=k))(physics, x, jax.random.key(1))

    den = DnCNN(1, 1, pretrained=None)
    sure = SureGaussianLoss(sigma=sigma_n)
    ei = EILoss(Rotate())
    opt = opt0 = optax.adam(1e-4)

    def recon(m, yv, p):
        if dtype == "bf16":
            from deepinv_tpu.models import autocast

            return autocast(m)(p.A_adjoint(yv), sigma_n).astype(jnp.float32)
        return m(p.A_adjoint(yv), sigma_n)

    def loss_fn(m, yv, key):
        model = lambda v, p: recon(m, v, p)
        x_net = model(yv, physics)
        k1, k2 = jax.random.split(key)
        l_sure = jnp.mean(sure(y=yv, physics=physics, model=model,
                               x_net=x_net, key=k1))
        l_ei = jnp.mean(ei(x_net=x_net, physics=physics, model=model, key=k2))
        return l_sure + l_ei

    def step(carry, key):
        from deepinv_tpu.ops.pallas.conv_chain import fused_chains_disabled

        m, os_ = carry
        with fused_chains_disabled():
            _, grads = jax.value_and_grad(loss_fn)(m, y, key)
        updates, os_ = opt.update(grads, os_, m)
        m = optax.apply_updates(m, updates)
        return (m, os_), None

    def make_runner(n):
        f = jax.jit(lambda m, s, ks: jax.lax.scan(step, (m, s), ks)[0])
        s0 = opt0.init(den)
        ks = jax.random.split(jax.random.key(3), n)
        return lambda: f(den, s0, ks)

    n_short = max(max(N_ITER // 4, 8) // max(1, batch // 4), 6)
    dt = _timed_slope(make_runner, n_short, 4 * n_short)
    its = 1.0 / dt
    row = {
        "metric": meta["metric"]
        + ("" if dtype == "bf16" else f"_{dtype}")
        + (f"_b{batch}" if batch > 1 else ""),
        "value": round(its, 2),
        "unit": "step/s",
    }
    if batch > 1:
        # per-image comparison vs the B=1 CPU figure (the 8-thread CPU
        # gains nothing from batching — TORCH_CPU_IMGS measurements)
        row["batch"] = batch
        row["images_per_sec"] = round(its * batch, 2)
        row["vs_baseline"] = round(its * batch / meta["torch_cpu_its"], 2)
    elif meta["torch_cpu_its"]:
        row["vs_baseline"] = round(its / meta["torch_cpu_its"], 2)
    try:
        from deepinv_tpu.utils.profiling import compiled_cost

        c = compiled_cost(
            lambda m, s, k: step((m, s), k)[0], den, opt0.init(den),
            jax.random.key(3))
        peaks = CHIP_PEAKS.get(jax.devices()[0].device_kind)
        if c.get("flops", 0) > 0:
            row["model_flops"] = round(c["flops"] / 1e9, 2)
            row["bytes_per_iter"] = round(c.get("bytes accessed", 0) / 1e6, 1)
            if peaks:
                row["mfu"] = round(c["flops"] * its / peaks["bf16_flops"], 3)
                row["hbm_util_bound"] = round(
                    c.get("bytes accessed", 0) * its / peaks["hbm_gbps"], 3)
    except Exception:
        pass
    return row


def _run_config(config, dtype=None, batch=1):
    if config == "train":
        return _run_train_config(dtype, batch=batch)
    if config in ("sampling", "sampling_sr"):
        return _run_sampling_config(config, dtype, batch=batch)
    if config == "train_ssl":
        return _run_train_ssl_config(dtype, batch=batch)
    meta = CONFIGS[config]
    if dtype is not None:
        os.environ["BENCH_DTYPE"] = dtype
    dtype = os.environ.get("BENCH_DTYPE", "bf16")
    physics, y, denoiser, algo, params = _problem(config, jax.random.key(0),
                                                  batch=batch)

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

    # size the programs so the long one still runs ~1 s of device compute
    # at batch (per-iteration cost grows ~linearly in B)
    n_iter = max(N_ITER // max(1, batch // 2), 8)
    t_short = build(n_iter)
    t_long = build(n_iter * 4)
    dt = (t_long - t_short) / (n_iter * 3)

    its = 1.0 / dt
    suffix = ("" if dtype == "bf16" else f"_{dtype}") + (
        f"_b{batch}" if batch > 1 else "")
    row = {
        "metric": meta["metric"] + suffix,
        "value": round(its, 2),
        "unit": "iter/s",
    }
    if batch > 1:
        # batched rows compare images/s against the torch-CPU reference
        # at the SAME batch (measured by scripts/bench_torch_cpu.py); the
        # per-iteration figure stays in `value` for roofline math.
        row["batch"] = batch
        row["images_per_sec"] = round(its * batch, 2)
        cpu = TORCH_CPU_IMGS.get((config, batch), meta["torch_cpu_its"])
        row["vs_baseline"] = round(its * batch / cpu, 2)
    else:
        row["vs_baseline"] = round(its / meta["torch_cpu_its"], 2)

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
    # BENCH_CONFIG selects one config (with optional BENCH_BATCH); the
    # default suite covers all five BASELINE.json workloads at batch 1 AND
    # at batch (VERDICT r4 #1/#2): batched rows report images/s/chip against
    # the torch-CPU reference at the SAME batch. One JSON line per row; the
    # headline (deblur bf16 B=1) prints LAST because the driver parses the
    # tail. An f32 cross-check row for the headline config (BENCH_F32=0 to
    # skip) guards against bf16-only numerics drift going unnoticed on TPU.
    sel = os.environ.get("BENCH_CONFIG")
    if sel:
        batch = int(os.environ.get("BENCH_BATCH", "1"))
        print(json.dumps(_run_config(sel, batch=batch)), flush=True)
        return
    suite = [
        ("mri", None, 1), ("mri", None, 8),
        ("ct", None, 1), ("ct", None, 8),
        ("train", None, 1), ("train", None, 16),
        ("sampling", None, 1), ("sampling", None, 8),
        ("sampling_sr", None, 1),
        ("train_ssl", None, 1), ("train_ssl", None, 16),
        ("deblur", "bf16", 8),
    ]
    if os.environ.get("BENCH_F32", "1") == "1":
        suite.append(("deblur", "f32", 1))
    suite.append(("deblur", "bf16", 1))  # headline LAST
    for config, dtype, batch in suite:
        print(json.dumps(_run_config(config, dtype=dtype, batch=batch)),
              flush=True)


if __name__ == "__main__":
    main()
