"""Train-step timing of the fused DnCNN chain: fwd+bwd via the DMA-stash
custom_vjp vs the pure-XLA bf16 chain vs the f32 chain. Also spot-checks the
Mosaic (non-interpret) stash kernel against the XLA forward."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from deepinv_tpu.ops.pallas.conv_chain import (
    _lax_chain, _lax_chain_f32, fused_conv3x3_relu_chain,
    _fused_fwd_stash_impl)

N = 16
L, H, W = 18, 256, 256


def slope_time(step, *args):
    def run(iters):
        f = jax.jit(lambda v, *c: jax.lax.scan(
            lambda carry, _: (step(carry, *c), None), v, None,
            length=iters)[0])
        _ = np.asarray(jax.device_get(f(*args))).ravel()[:1]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            o = f(*args)
            _ = np.asarray(jax.device_get(o)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(4 * N) - run(N)) / (3 * N)


def main():
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    ws = jax.random.normal(k1, (L, 64, 64, 3, 3)) * 0.05
    bs = jax.random.normal(k2, (L, 64)) * 0.02
    h = jax.random.normal(k3, (1, 64, H, W), jnp.bfloat16)

    # Mosaic stash-kernel forward parity vs XLA bf16 chain
    out_s, acts = jax.jit(
        lambda hh, w, b: _fused_fwd_stash_impl(hh, w, b, False))(h, ws, bs)
    want = jax.jit(_lax_chain)(h, ws, bs)
    err = float(jnp.max(jnp.abs(out_s.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"stash fwd parity: {err/scale:.2e} (acts {acts.shape})")

    # fwd-only comparison (stash vs plain fused vs XLA)
    def red(o):
        return jnp.mean(o.astype(jnp.float32))

    dt = slope_time(lambda v: v + red(
        _fused_fwd_stash_impl(v, ws, bs, False)[0]).astype(v.dtype), h)
    print(f"fwd stash-kernel      {dt*1e3:8.3f} ms")
    dt = slope_time(lambda v: v + red(
        fused_conv3x3_relu_chain(v, ws, bs)).astype(v.dtype), h)
    print(f"fwd fused (no stash)  {dt*1e3:8.3f} ms")
    dt = slope_time(lambda v: v + red(_lax_chain(v, ws, bs)).astype(v.dtype), h)
    print(f"fwd XLA bf16          {dt*1e3:8.3f} ms")

    # fwd+bwd (training step shape): grads w.r.t. weights + input
    def train_fused(v, w):
        def loss(vv, wv):
            return jnp.mean(fused_conv3x3_relu_chain(vv, wv, bs)
                            .astype(jnp.float32) ** 2)
        gv, gw = jax.grad(loss, argnums=(0, 1))(v, w)
        return v + gv.astype(v.dtype) + jnp.mean(gw).astype(v.dtype)

    def train_xla_bf16(v, w):
        def loss(vv, wv):
            def chain(hh, wf):
                a = hh.astype(jnp.float32)
                for l in range(wf.shape[0]):
                    wb = wf[l].astype(jnp.bfloat16).astype(jnp.float32)
                    z = jax.lax.conv_general_dilated(
                        a, wb, (1, 1), [(1, 1), (1, 1)],
                        dimension_numbers=("NCHW", "OIHW", "NCHW"))
                    a = jnp.maximum(z + bs[l][None, :, None, None], 0.0)
                    a = a.astype(jnp.bfloat16).astype(jnp.float32)
                return a
            return jnp.mean(chain(vv, wv) ** 2)
        gv, gw = jax.grad(loss, argnums=(0, 1))(v, w)
        return v + gv.astype(v.dtype) + jnp.mean(gw).astype(v.dtype)

    def train_xla_f32(v, w):
        def loss(vv, wv):
            return jnp.mean(_lax_chain_f32(vv.astype(jnp.float32), wv, bs) ** 2)
        gv, gw = jax.grad(loss, argnums=(0, 1))(v, w)
        return v + gv.astype(v.dtype) + jnp.mean(gw).astype(v.dtype)

    dt_f = slope_time(train_fused, h, ws)
    print(f"fwd+bwd fused/stash   {dt_f*1e3:8.3f} ms")
    dt_b = slope_time(train_xla_bf16, h, ws)
    print(f"fwd+bwd XLA bf16      {dt_b*1e3:8.3f} ms  ({dt_b/dt_f:.2f}x)")
    dt_3 = slope_time(train_xla_f32, h, ws)
    print(f"fwd+bwd XLA f32       {dt_3*1e3:8.3f} ms  ({dt_3/dt_f:.2f}x)")


if __name__ == "__main__":
    main()
