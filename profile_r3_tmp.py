#!/usr/bin/env python
"""Round-3 profiling with the chain-slope method (tunnel-latency safe).

Times (a) the bare Pallas banded kernel, (b) full consensus_votes, by
chaining k dependent calls and taking the slope between k=1 and k=4.
"""
import time

import numpy as np

from consent_tpu.utils.jaxcache import enable as _enable_cache
_enable_cache()
import jax
import jax.numpy as jnp

from consent_tpu.ops import consensus as cons_ops
from consent_tpu.ops import pallas_align as pa
from consent_tpu.ops.align import Scoring

B, S, W = 64, 16, 512
Lf = W
rng = np.random.default_rng(0)
tpl = rng.integers(0, 4, (B, W)).astype(np.uint8)
frags = np.zeros((B, S, Lf), dtype=np.uint8)
frag_len = np.zeros((B, S), dtype=np.int32)
for b in range(B):
    for s in range(S):
        L = W - int(rng.integers(0, 40))
        f = tpl[b, :L].copy()
        n_err = L // 10
        pos = rng.integers(0, L, n_err)
        f[pos] = (f[pos] + 1 + rng.integers(0, 3, n_err)) % 4
        frags[b, s, :L] = f
        frag_len[b, s] = L

frags_d = jnp.asarray(frags)
fl_d = jnp.asarray(frag_len)
tpl_d = jnp.asarray(tpl)
tl_d = jnp.asarray(np.full(B, W, np.int32))
scoring = Scoring(max_hgap=16, band=128)

N = B * S
q0 = jnp.asarray(frags.reshape(N, Lf).astype(np.int32))
ql = jnp.asarray(frag_len.reshape(N))
r = jnp.asarray(np.repeat(tpl, S, axis=0).astype(np.int32))
rl = jnp.asarray(np.full(N, W, np.int32))
d0 = jnp.zeros(N, jnp.int32)


def chain_kernel(k, q):
    out = None
    for _ in range(k):
        out = pa.pallas_banded_posterior_summary(q, ql, r, rl, d0, scoring)
        q = (q + out.base) % 4
    return jax.device_get(out.opt).sum()


def chain_votes(k, fr):
    out = None
    for _ in range(k):
        out = cons_ops.consensus_votes(
            fr, fl_d, tpl_d, tl_d, S=S, min_column_support=2,
            scoring=scoring)
        fr = (fr + out.col_base[:, None, :].astype(jnp.uint8)) % 4
    return jax.device_get(out.coverage).sum()


def slope_ms(chain, arg, reps=3):
    chain(1, arg)
    chain(4, arg)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter(); chain(1, arg); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); chain(4, arg); t4 = time.perf_counter() - t0
        vals.append((t4 - t1) / 3)
    return float(np.median(vals)) * 1e3


kms = slope_ms(chain_kernel, q0)
vms = slope_ms(chain_votes, frags_d)
print(f"pallas banded kernel : {kms:8.2f} ms/call ({B/(kms/1e3):8.0f} windows/s-equiv)")
print(f"consensus_votes      : {vms:8.2f} ms/call ({B/(vms/1e3):8.0f} windows/s)")
print(f"epilogue overhead    : {vms-kms:8.2f} ms ({(vms-kms)/vms*100:.0f}% of total)")
