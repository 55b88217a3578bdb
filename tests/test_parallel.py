"""Distributed tests on the virtual 8-device CPU mesh.

Mirrors the reference's multi-vs-single-process consistency tests
(test_distributed.py:789,1016) without process spawning.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepinv_tpu.parallel import (
    DistributedContext,
    DistributedStackedLinearPhysics,
    DistributedProcessing,
    DistributedDataFidelity,
    distribute,
)
from deepinv_tpu.physics import Blur, Inpainting, stack
from deepinv_tpu.ops import gaussian_blur
from deepinv_tpu.optim import L2
from deepinv_tpu.models import MedianFilter
from conftest import assert_close

IMSIZE = (1, 32, 32)


@pytest.fixture(scope="module")
def ctx():
    return DistributedContext(axis_names=("op",))


@pytest.fixture(scope="module")
def physics_list():
    return [
        Blur(filter=gaussian_blur(sigma=0.5 + 0.3 * i), padding="circular")
        for i in range(8)
    ]


def _filters_same_size(physics_list):
    # pad filters to common size so the stack is homogeneous
    sizes = [p.filter.shape[-1] for p in physics_list]
    m = max(sizes)
    out = []
    for p in physics_list:
        f = p.filter
        pad = (m - f.shape[-1]) // 2
        f = jnp.pad(f, [(0, 0), (0, 0), (pad, m - f.shape[-2] - pad), (pad, m - f.shape[-1] - pad)])
        out.append(p.replace(filter=f / jnp.sum(f)))
    return out


def test_distributed_vs_sequential_consistency(ctx, physics_list):
    """Multi-device result == sequential stacked result
    (reference test_consistency_single_vs_multiprocess :789)."""
    plist = _filters_same_size(physics_list)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    x = jax.random.normal(jax.random.key(0), (2,) + IMSIZE)
    y = dphys.A(x)
    assert y.shape[0] == 8
    # sequential reference
    y_seq = jnp.stack([p.A(x) for p in plist])
    assert_close(y, y_seq, rtol=1e-5, atol=1e-5)

    at = dphys.A_adjoint(y)
    at_seq = sum(p.A_adjoint(yi) for p, yi in zip(plist, y_seq))
    assert_close(at, at_seq, rtol=1e-4, atol=1e-5)


def test_distributed_norm_and_dagger(ctx, physics_list):
    """Distributed power method == local power method
    (reference test_compute_norm_local_vs_global :1016)."""
    plist = _filters_same_size(physics_list)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    x = jax.random.normal(jax.random.key(1), (1,) + IMSIZE)
    n_dist = float(dphys.compute_norm(x, max_iter=100))
    # local reference: norm of the stacked operator = sum of A_i^T A_i
    def ata(v):
        return sum(p.A_adjoint(p.A(v)) for p in plist)

    from deepinv_tpu.core import power_method

    n_local = float(power_method(ata, x, max_iter=100))
    assert abs(n_dist - n_local) / n_local < 1e-3

    y = dphys.A(x)
    x_dag = dphys.A_dagger(y, max_iter=200)
    y2 = dphys.A(x_dag)
    rel = float(jnp.sum((y2 - y) ** 2) / jnp.sum(y**2))
    assert rel < 1e-3


def test_distributed_data_fidelity(ctx, physics_list):
    plist = _filters_same_size(physics_list)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    dfid = DistributedDataFidelity(L2(), ctx)
    x = jax.random.normal(jax.random.key(2), (2,) + IMSIZE)
    xg = jax.random.normal(jax.random.key(3), (2,) + IMSIZE)
    y = dphys.A(xg)
    g = dfid.grad(x, y, dphys)
    g_seq = sum(
        p.A_adjoint(p.A(x) - yi) for p, yi in zip(plist, [y[i] for i in range(8)])
    )
    assert_close(g, g_seq, rtol=1e-4, atol=1e-5)
    # gradient descent with the distributed fidelity converges — one
    # compiled loop (50 eager shard_map dispatches took >3 min on the
    # 8-virtual-device CPU mesh)
    @jax.jit
    def gd(z0):
        return jax.lax.fori_loop(
            0, 50, lambda _, z: z - 0.1 * dfid.grad(z, y, dphys), z0
        )

    z = gd(x)
    assert float(jnp.mean((z - xg) ** 2)) < float(jnp.mean((x - xg) ** 2))


def test_spatial_processing_consistency():
    """Sharded tiled denoiser == single-device denoiser away from tile
    boundaries; with enough overlap, everywhere (reference
    OverlapTilingStrategy trimming)."""
    ctx = DistributedContext(axis_names=("sp",))
    den = MedianFilter(3)
    dden = DistributedProcessing(den, ctx, overlap=4)
    x = jax.random.normal(jax.random.key(4), (1, 1, 64, 32))
    out_d = dden(x)
    out_s = den(x)
    assert out_d.shape == out_s.shape
    assert_close(out_d, out_s, rtol=1e-5, atol=1e-5)


def test_distribute_dispatcher(physics_list):
    ctx = DistributedContext(axis_names=("op",))
    plist = _filters_same_size(physics_list)
    d1 = distribute(plist, ctx)
    assert isinstance(d1, DistributedStackedLinearPhysics)
    d2 = distribute(L2(), ctx)
    assert isinstance(d2, DistributedDataFidelity)
    ctx_sp = DistributedContext(axis_names=("sp",))
    d3 = distribute(MedianFilter(3), ctx_sp)
    assert isinstance(d3, DistributedProcessing)


def test_distributed_pnp_loop(ctx, physics_list):
    """Full distributed PnP-style loop: grad on sharded physics + spatially
    sharded denoiser (reference demo_pnp_distributed flow)."""
    plist = _filters_same_size(physics_list)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    dfid = DistributedDataFidelity(L2(), ctx)
    xg = jnp.clip(jax.random.normal(jax.random.key(5), (1,) + IMSIZE), 0, 1)
    y = dphys.A(xg)
    x = jnp.zeros_like(xg)
    den = MedianFilter(3)
    tau = 0.1
    for _ in range(20):
        x = x - tau * dfid.grad(x, y, dphys)
        x = den(x, 0.05)
    assert float(jnp.mean((x - xg) ** 2)) < float(jnp.mean(xg**2))


def test_data_parallel_trainer():
    """Data-parallel training over the 8-device mesh gives the same result
    as single-device training (deterministic keys)."""
    import numpy as np
    from deepinv_tpu.training import Trainer
    from deepinv_tpu.datasets import ArrayDataset, DataLoader, random_circles
    from deepinv_tpu.physics import Denoising, GaussianNoise
    from deepinv_tpu.models import DnCNN

    data = np.stack([random_circles(16, seed=i) for i in range(16)])

    def run(dp):
        dl = DataLoader(ArrayDataset(data), batch_size=8, shuffle=False)
        t = Trainer(
            DnCNN(1, 1, depth=3, nf=4), Denoising(noise_model=GaussianNoise(0.1)),
            train_dataloader=dl, online_measurements=True, epochs=2,
            verbose=False, data_parallel=dp, seed=0,
        )
        t.train()
        return t.model

    m_dp = run(True)
    m_sp = run(False)
    assert_close(m_dp.in_conv.weight, m_sp.in_conv.weight, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("M", [1, 3, 8])
def test_pipeline_parallel_unrolled(M):
    """GPipe pipeline over a 'pp' axis: chunks of unrolled PGD iterations
    pipelined across 4 devices match the sequential unrolled network, in
    value and in gradient w.r.t. the per-stage stepsizes — across
    under-/exactly-/over-subscribed microbatch schedules (M vs S)."""
    from deepinv_tpu.parallel import DistributedContext, pipeline, PipelineParallel

    pctx = DistributedContext(axis_names=("pp",), devices=jax.devices()[:4])
    physics = Inpainting(img_size=(1, 16, 16), mask=0.5, key=jax.random.key(0))
    S, K, B = 4, 2, 2
    stepsizes = jnp.linspace(0.9, 1.2, S).reshape(S, 1)

    def stage_apply(step, carry):
        x, y = carry
        for _ in range(K):
            x = x - step[0] * physics.A_adjoint(physics.A(x) - y)
            x = jnp.clip(x, 0.0, 1.0)
        return (x, y)

    xt = jax.random.uniform(jax.random.key(1), (M, B, 1, 16, 16))
    y = jax.vmap(physics.A)(xt)
    x0 = jax.vmap(physics.A_adjoint)(y)

    def run_seq(steps, x0, y):
        def one(x0i, yi):
            c = (x0i, yi)
            for i in range(S):
                c = stage_apply(steps[i], c)
            return c[0]
        return jax.vmap(one)(x0, y)

    def run_pp(steps, x0, y):
        return pipeline(steps, stage_apply, (x0, y), pctx, pp_axis="pp")[0]

    out_seq = run_seq(stepsizes, x0, y)
    out_pp = jax.jit(run_pp)(stepsizes, x0, y)
    assert_close(out_pp, out_seq, rtol=1e-5, atol=1e-6)

    g_seq = jax.grad(lambda s: jnp.sum((run_seq(s, x0, y) - xt) ** 2))(stepsizes)
    g_pp = jax.jit(jax.grad(lambda s: jnp.sum((run_pp(s, x0, y) - xt) ** 2)))(stepsizes)
    assert_close(g_pp, g_seq, rtol=1e-4, atol=1e-5)

    # module wrapper over a flat batch carry
    wrap = PipelineParallel(stepsizes, stage_apply, pctx, n_microbatches=M)
    flat = (x0.reshape(M * B, 1, 16, 16), y.reshape(M * B, 1, 16, 16))
    out_w = wrap(flat)[0].reshape(M, B, 1, 16, 16)
    assert_close(out_w, out_seq, rtol=1e-5, atol=1e-6)


def test_tensor_parallel_conv_channels():
    """Tensor parallelism for conv stacks: hidden channels sharded over a
    'tp' axis give the same forward and gradients as replicated weights —
    XLA SPMD inserts the channel all-reduces."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from deepinv_tpu.models import DnCNN

    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), axis_names=("tp",))
    model = DnCNN(in_channels=1, out_channels=1, depth=4, nf=8)
    x = jax.random.uniform(jax.random.key(0), (2, 1, 16, 16))

    def loss(m, v):
        return jnp.sum(m(v, 0.1) ** 2)

    ref_out = model(x, 0.1)
    ref_grad = jax.grad(loss)(model, x)

    # shard hidden conv weights: O-dim for the in conv, I-dim checked by XLA
    def shard_leaf(path_conv):
        w = path_conv.weight
        if w.shape[0] % 4 == 0:
            return path_conv.replace(
                weight=jax.device_put(w, NamedSharding(mesh, P("tp", None, None, None))))
        return path_conv

    model_tp = model.replace(
        in_conv=shard_leaf(model.in_conv),
        conv_list=[shard_leaf(c) for c in model.conv_list],
    )
    x_tp = jax.device_put(x, NamedSharding(mesh, P()))
    out = jax.jit(lambda m, v: m(v, 0.1))(model_tp, x_tp)
    assert_close(out, ref_out, rtol=1e-5, atol=1e-6)
    g = jax.jit(jax.grad(loss))(model_tp, x_tp)
    assert_close(g.in_conv.weight, ref_grad.in_conv.weight, rtol=1e-4, atol=1e-5)


def test_nonlinear_distributed_stacked_physics(ctx):
    """Nonlinear stack: homogeneous vmapped path == sequential evaluation
    (reference distrib_framework.py:234 DistributedStackedPhysics)."""
    from deepinv_tpu.parallel import DistributedStackedPhysics
    from deepinv_tpu.physics import PhaseRetrieval, BlurFFT, Haze, Denoising

    key = jax.random.key(0)
    x = jax.random.uniform(key, (1,) + IMSIZE) + 0.1
    # nonlinear y = |Bx|^2 over 8 different (same-shape) blurs: the stack is
    # structurally identical, so the vmapped shard_map path applies
    plist = [
        PhaseRetrieval(B=BlurFFT(img_size=IMSIZE,
                                 filter=gaussian_blur(sigma=0.5 + 0.2 * i,
                                                      psf_size=(7, 7))))
        for i in range(8)
    ]
    dphys = DistributedStackedPhysics(plist, ctx)
    assert dphys.batched is not None  # homogeneous fast path
    y = jax.jit(dphys.A)(x)
    assert y.shape[0] == 8
    for i in [0, 3, 7]:
        assert_close(y[i], plist[i].A(x), rtol=1e-4, atol=1e-5)

    # full forward with per-operator noise keys runs and differs from A
    yf = dphys.forward(x, key=jax.random.key(1))
    assert yf.shape == y.shape

    # heterogeneous stacks fall back to a TensorList
    het = DistributedStackedPhysics([Denoising(), Haze()], ctx)
    assert het.batched is None
    yh = het.A(x)
    assert len(yh) == 2


def test_distribute_factory_callable(ctx):
    """Factory callables f(idx, device, params) build the stack lazily
    (reference distribute.py:62,77)."""
    from deepinv_tpu.parallel import DistributedStackedLinearPhysics

    def factory(idx, device, params):
        return Blur(
            filter=gaussian_blur(sigma=params["base"] + 0.3 * idx,
                                 psf_size=(7, 7)),
            padding="circular",
        )

    dphys = distribute(
        factory, ctx, num_operators=8, type_object="linear_physics",
        factory_kwargs={"base": 0.5},
    )
    assert isinstance(dphys, DistributedStackedLinearPhysics)
    x = jax.random.normal(jax.random.key(0), (1,) + IMSIZE)
    y = dphys.A(x)
    ref = factory(3, None, {"base": 0.5}).A(x)
    assert_close(y[3], ref, rtol=1e-4, atol=1e-5)

    # missing num_operators is an explicit error
    with pytest.raises(ValueError):
        distribute(factory, ctx, type_object="linear_physics")


def test_processing_options():
    """tiling_strategy='basic' skips the halo; max_batch_size chunks the
    batch; tiling_dims=-1 shards columns (reference distribute.py:214-330)."""
    sp = DistributedContext(axis_names=("sp",))
    med = MedianFilter(kernel_size=3)
    x = jax.random.uniform(jax.random.key(0), (3, 1, 64, 64))

    ref = med(x, 0.1)
    for kwargs in [
        dict(overlap=4),
        dict(overlap=4, max_batch_size=2),
        dict(overlap=4, tiling_dims=-1),
    ]:
        d = DistributedProcessing(med, sp, **kwargs)
        assert_close(jax.jit(d)(x, 0.1), ref, rtol=1e-5, atol=1e-6)

    # basic tiling differs from the reference output only near tile seams
    d_basic = DistributedProcessing(med, sp, tiling_strategy="basic")
    out_basic = d_basic(x, 0.1)
    assert out_basic.shape == ref.shape
    # rows 2-5 sit inside the first 8-row tile, one row clear of the seam
    interior = (slice(None), slice(None), slice(2, 6), slice(None))
    assert_close(out_basic[interior], ref[interior], rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        DistributedProcessing(med, sp, tiling_strategy="bogus")
    with pytest.raises(ValueError):
        DistributedProcessing(med, sp, tiling_dims=(0, 1))


def test_gather_strategies_equivalence(ctx, physics_list):
    """All three reference gather strategies produce bit-identical results
    on TPU (gathering is an XLA sharding decision, not a user-level
    serialization choice — reference distrib_framework.py:262 exposes
    'naive'/'concatenated'/'broadcast' with equal math)."""
    plist = _filters_same_size(physics_list)
    x = jax.random.normal(jax.random.key(20), (2,) + IMSIZE)
    outs_A, outs_At = [], []
    for strategy in ("naive", "concatenated", "broadcast"):
        d = DistributedStackedLinearPhysics(plist, ctx,
                                            gather_strategy=strategy)
        y = d.A(x)
        outs_A.append(np.asarray(y))
        outs_At.append(np.asarray(d.A_adjoint(y)))
    assert np.array_equal(outs_A[0], outs_A[1])
    assert np.array_equal(outs_A[0], outs_A[2])
    assert np.array_equal(outs_At[0], outs_At[1])
    assert np.array_equal(outs_At[0], outs_At[2])
    with pytest.raises(ValueError):
        DistributedStackedLinearPhysics(plist, ctx, gather_strategy="bogus")


@pytest.mark.parametrize("n_ops", [10, 3])
def test_non_divisible_operator_count(ctx, n_ops):
    """Operator counts that don't divide the mesh (10 on 8 devices) and
    fewer operators than devices (3 on 8 — the reference's 'empty local
    set', test_distributed.py:855) both match the sequential stack."""
    plist = _filters_same_size([
        Blur(filter=gaussian_blur(sigma=0.5 + 0.2 * i), padding="circular")
        for i in range(n_ops)
    ])
    d = DistributedStackedLinearPhysics(plist, ctx)
    x = jax.random.normal(jax.random.key(21), (2,) + IMSIZE)
    y = d.A(x)
    assert y.shape[0] == n_ops
    y_seq = jnp.stack([p.A(x) for p in plist])
    assert_close(y, y_seq, rtol=1e-5, atol=1e-5)

    at = d.A_adjoint(y)
    at_seq = sum(p.A_adjoint(yi) for p, yi in zip(plist, y_seq))
    assert_close(at, at_seq, rtol=1e-4, atol=1e-5)

    # noise keys are independent per real operator and pads are dropped
    yn = d(x, key=jax.random.key(22))
    assert yn.shape[0] == n_ops

    # the full linear surface still works through the padded stack
    xd = d.A_dagger(y, max_iter=150)
    rel = float(jnp.sum((d.A(xd) - y) ** 2) / jnp.sum(y**2))
    assert rel < 1e-3


def test_factory_materializes_each_index_once(ctx):
    """A factory callable is invoked exactly once per operator index with
    the shared factory_kwargs (reference distribute.py:62-77)."""
    calls = []

    def factory(i, device, kwargs):
        calls.append((i, kwargs["sigma"]))
        # fixed psf_size so the stack is homogeneous (one batched operator)
        return Blur(filter=gaussian_blur(sigma=kwargs["sigma"] + 0.1 * i,
                                         psf_size=(7, 7)),
                    padding="circular")

    d = distribute(factory, ctx, num_operators=6, type_object="physics",
                   factory_kwargs={"sigma": 0.5})
    assert sorted(c[0] for c in calls) == list(range(6))
    assert all(c[1] == 0.5 for c in calls)
    x = jax.random.normal(jax.random.key(23), (1,) + IMSIZE)
    assert d.A(x).shape[0] == 6


def test_data_fidelity_per_operator_list(ctx, physics_list):
    """DistributedDataFidelity with a per-operator fidelity list matches
    the explicit per-operator sum (reference test_distributed.py:1460)."""
    from deepinv_tpu.optim import L1

    plist = _filters_same_size(physics_list)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    fids = [L2() if i % 2 == 0 else L1() for i in range(8)]
    dfid = DistributedDataFidelity(fids, ctx)
    x = jax.random.normal(jax.random.key(24), (2,) + IMSIZE)
    xg = jax.random.normal(jax.random.key(25), (2,) + IMSIZE)
    y = dphys.A(xg)
    val = dfid(x, y, dphys)
    val_seq = sum(
        float(jnp.sum(f(x, y[i], p)))
        for i, (f, p) in enumerate(zip(fids, plist))
    )
    assert abs(float(jnp.sum(val)) - val_seq) / abs(val_seq) < 1e-4


def test_distributed_fidelity_autodiff_matches_serial(ctx, physics_list):
    """jax.grad THROUGH the distributed fidelity value equals the serial
    gradient — differentiability of the shard_map path (reference
    test_distributed.py gradient-consistency family)."""
    plist = _filters_same_size(physics_list)
    sp = stack(*plist)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    dfid = DistributedDataFidelity(L2(), ctx)
    x = jax.random.uniform(jax.random.key(3), (1,) + IMSIZE)
    y = dphys.A(x) + 0.1

    g_dist = jax.grad(lambda v: jnp.sum(dfid(v, y, dphys)))(x)
    fid = L2()
    g_serial = jax.grad(lambda v: sum(
        jnp.sum(fid(v, y[i], p)) for i, p in enumerate(plist)))(x)
    assert_close(g_dist, g_serial, atol=1e-4)


@pytest.mark.parametrize("overlap", [2, 4, 8])
def test_processing_overlap_equivalence_linear(overlap):
    """DistributedProcessing on an ELEMENTWISE module is exact for every
    overlap (halo rows are recomputed identically then trimmed), so
    sharded == direct (reference DistributedProcessing equivalence
    family)."""
    ctx = DistributedContext(axis_names=("sp",))
    lin = lambda v, sigma=None: 2.0 * v - 0.1
    proc = DistributedProcessing(lin, ctx, overlap=overlap)
    x = jax.random.uniform(jax.random.key(0), (1, 1, 64, 64))
    out = proc(x)
    assert_close(out, lin(x, None), atol=1e-5)


@pytest.mark.parametrize("tiling_dims", [-1, -2])
def test_processing_tiling_dims_variants(tiling_dims):
    """Column / row / 2D grid sharding all reproduce the direct result for
    a local (3x3-support) module when the halo covers the support
    (reference tiling_dims option)."""
    from deepinv_tpu.ops import conv2d, gaussian_blur

    ctx = DistributedContext(axis_names=("sp",))
    h = gaussian_blur(sigma=0.7)
    blur = lambda v, sigma=None: conv2d(v, h, padding="circular")
    proc = DistributedProcessing(blur, ctx, overlap=max(h.shape[-2:]),
                                 tiling_dims=tiling_dims)
    x = jax.random.uniform(jax.random.key(1), (1, 1, 64, 64))
    out = proc(x)
    direct = blur(x, None)
    # circular padding differs from halo replication only at the global
    # border; compare the interior
    pad = max(h.shape[-2:])
    assert_close(out[..., pad:-pad, pad:-pad],
                 direct[..., pad:-pad, pad:-pad], atol=1e-4)


def test_distributed_fidelity_in_pgd_matches_serial(ctx, physics_list):
    """A full PGD reconstruction with the DISTRIBUTED fidelity + stacked
    physics equals the serial run on the same measurements (reference
    end-to-end consistency, test_distributed.py:789)."""
    from deepinv_tpu.optim import Tikhonov, optim_builder

    plist = _filters_same_size(physics_list[:4])
    sp = stack(*plist)
    dphys = DistributedStackedLinearPhysics(plist, ctx)
    dfid = DistributedDataFidelity(L2(), ctx)
    x = jax.random.uniform(jax.random.key(5), (1,) + IMSIZE)
    y_s = sp.A(x)
    y_d = dphys.A(x)

    def recon(fid, y, physics):
        m = optim_builder("PGD", data_fidelity=fid, prior=Tikhonov(),
                          params_algo={"stepsize": 0.3, "lambda": 0.05},
                          max_iter=30)
        return m(y, physics)

    serial = recon(L2(), y_s, sp)
    dist = recon(dfid, y_d, dphys)
    assert_close(serial, dist, atol=1e-4)


def test_distribute_model_type(ctx):
    """distribute() with a denoiser module spatially shards it
    (type_object='model'/'auto' path) and matches direct application in
    the interior (reference distribute surface)."""
    den = MedianFilter()
    proc = distribute(lambda v, sigma=None: den(v, 0.1),
                      DistributedContext(axis_names=("sp",)),
                      type_object="denoiser", overlap=8)
    x = jax.random.uniform(jax.random.key(6), (1, 1, 64, 64))
    out = proc(x)
    want = den(x, 0.1)
    assert_close(out[..., 4:-4, 4:-4], want[..., 4:-4, 4:-4], atol=1e-5)
