#!/usr/bin/env python
"""Sweep device-batch geometry for the consensus hot path on the real
chip: (a) kernel tile width via pallas_banded_posterior_summary's
tile_lanes, (b) total lanes per call (B*S) via consensus_votes.
Informs MAX_LANES in pipeline/engine.py and TILE_LANES in
ops/pallas_align.py."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_inputs(B, S, W, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    tpl = rng.integers(0, 4, (B, W)).astype(np.uint8)
    frags = np.zeros((B, S, W), dtype=np.uint8)
    frag_len = np.zeros((B, S), dtype=np.int32)
    for b in range(B):
        for s in range(S):
            L = W - int(rng.integers(0, 40))
            f = tpl[b, :L].copy()
            pos = rng.integers(0, L, L // 10)
            f[pos] = (f[pos] + 1 + rng.integers(0, 3, L // 10)) % 4
            frags[b, s, :L] = f
            frag_len[b, s] = L
    return (
        jnp.asarray(frags),
        jnp.asarray(frag_len),
        jnp.asarray(tpl),
        jnp.asarray(np.full(B, W, np.int32)),
    )


def time_call(fn, reps=6):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from consent_tpu.utils.jaxcache import enable

    enable()
    import jax.numpy as jnp

    from consent_tpu.ops import pallas_align as pa
    from consent_tpu.ops import consensus as cons_ops
    from consent_tpu.ops.align import Scoring

    W = 512
    sc = Scoring(max_hgap=16, band=128)

    print("== kernel-only: tile_lanes sweep (N=2048 lanes) ==", flush=True)
    frags, frag_len, tpl, tpl_len = make_inputs(128, 16, W)
    N = 128 * 16
    q = frags.reshape(N, W)
    ql = frag_len.reshape(N)
    r = jnp.repeat(tpl, 16, axis=0)
    rl = jnp.repeat(tpl_len, 16)
    d0 = jnp.zeros((N,), jnp.int32)
    for tile in (64, 128, 256, 512):
        try:
            dt = time_call(
                lambda t=tile: pa.pallas_banded_posterior_summary(
                    q, ql, r, rl, d0, sc, tile_lanes=t
                )
            )
            print(f"tile={tile:4d}  {dt*1e3:8.2f} ms  "
                  f"{N/dt:10.1f} lanes/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile}: FAIL {type(e).__name__}: {e}", flush=True)

    print("== full consensus step: lanes-per-call sweep (S=16) ==",
          flush=True)
    for B in (64, 128, 256, 512):
        args = make_inputs(B, 16, W)
        try:
            dt = time_call(
                lambda a=args, b=B: cons_ops.consensus_votes(
                    *a, S=16, min_column_support=2, scoring=sc
                )
            )
            print(f"B={B:4d} lanes={B*16:6d}  {dt*1e3:8.2f} ms  "
                  f"{B/dt:9.1f} windows/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B={B}: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
