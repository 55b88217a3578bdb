"""Dump compiled-HLO op inventories for the up-chain sandwich variants to
locate the pathological op (layout copy / transpose fusion) that makes the
Pallas variant +0.9 ms when NHWC resblocks feed it."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from deepinv_tpu.models import DRUNet
from deepinv_tpu.models.drunet_fold import (_conv3_folded, _conv3_nhwc,
                                            _up_to_fold)
from deepinv_tpu.ops.pallas.resblock_chain import fused_resblock_chain_folded

N = 32


def inventory(fn, *args, label=""):
    txt = jax.jit(fn).lower(*args).compile().as_text()
    ops = Counter()
    copies = []
    for line in txt.splitlines():
        m = re.search(r"= (\w+)\(", line)
        if not m:
            continue
        op = m.group(1)
        ops[op] += 1
        if op in ("copy", "transpose", "bitcast"):
            copies.append(line.strip()[:160])
    print(f"--- {label} ---")
    for op, n in ops.most_common(12):
        print(f"  {op:22s} {n}")
    for c in copies[:8]:
        print("  COPY:", c)
    # biggest fusion shapes give a hint where time goes
    return txt


def main():
    den = DRUNet(pretrained=None)
    blocks = list(den.m_up1[1:])
    w1s = jnp.stack([b.conv1.weight for b in blocks])
    w2s = jnp.stack([b.conv2.weight for b in blocks])
    w_up0 = den.m_up1[0].weight
    up2 = list(den.m_up2)
    relu = lambda t: jnp.maximum(t, 0)
    v1 = jnp.zeros((1, 128, 128, 128), jnp.bfloat16)
    red = lambda o: jnp.mean(o.astype(jnp.float32))

    def rbs(v):
        for blk in up2[1:]:
            v = v + _conv3_nhwc(relu(_conv3_nhwc(v, blk.conv1.weight)),
                                blk.conv2.weight)
        return v

    def scan_of(step):
        return lambda v: jax.lax.scan(
            lambda c, _: (step(c), None), v, None, length=N)[0]

    chain = lambda u: fused_resblock_chain_folded(u, w1s, w2s)

    def xla_chain(u):
        for r in range(4):
            u = u + _conv3_folded(relu(_conv3_folded(u, w1s[r])), w2s[r])
        return u

    a = inventory(scan_of(lambda v: v + red(
        chain(_up_to_fold(rbs(v), w_up0))).astype(v.dtype)), v1,
        label="A rbs->up_to_fold->PALLAS chain")
    c = inventory(scan_of(lambda v: v + red(
        xla_chain(_up_to_fold(rbs(v), w_up0))).astype(v.dtype)), v1,
        label="C' rbs->up_to_fold->XLA chain")
    with open("/tmp/hlo_A.txt", "w") as f:
        f.write(a)
    with open("/tmp/hlo_C.txt", "w") as f:
        f.write(c)
    print("wrote /tmp/hlo_A.txt /tmp/hlo_C.txt")


if __name__ == "__main__":
    main()
