#!/usr/bin/env python
"""Benchmark: batched window-consensus throughput on one chip.

Metric: consensus windows/s of the device hot path (fused Pallas
fwd+bwd posterior alignment + vote reductions) at CLR-realistic shapes:
512-base windows, 16 fragment slots per window (~15x pile coverage).

Timing methodology: the axon tunnel makes naive block_until_ready
unreliable, so we time dependent call chains of two lengths and take
the slope, fetching results to the host for a hard sync.

Baseline: the reference CONSENT corrects its bundled example (~33.5 Mb
of 10x simulated PacBio reads; README.md:55) in ~2 min on 4 CPU cores.
At the default 500/50 windowing that is ~74k windows => ~620 windows/s.
(The example reads are LFS-missing from the snapshot, so this is the
documented envelope, not a rerun; see BASELINE.md.)
"""

import json
import time

import numpy as np

BASELINE_WINDOWS_PER_S = 620.0


def main():
    from consent_tpu.utils.jaxcache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp

    from consent_tpu.ops import consensus as cons_ops

    # B = the engine's PRODUCTION dispatch size for the S=16 bucket:
    # engine._max_b(16) = min(device_lanes*n_devices // 16, MAX_B)
    # = 256 at the default device_lanes=4096 on one chip.  (B=64, the
    # pre-r5 bench shape, measures ~4% slower per window — the bench
    # mirrors what the pipeline actually dispatches.)
    B, S, W = 256, 16, 512
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

    from consent_tpu.ops.align import Scoring

    # the pipeline's consensus scoring: capped horizontal gaps + the
    # 128-wide diagonal band (fragments are near-diagonal; see
    # consent_tpu/ops/pallas_align.py:_kernel_banded)
    scoring = Scoring(max_hgap=16, band=128)

    # compiled-Pallas regression gate: the timed kernel must agree with
    # the XLA fallback bit-for-bit (a Mosaic lowering bug fails the
    # bench loudly instead of drifting the numbers; see
    # tests/test_tpu_compiled.py for the pytest variant)
    if jax.default_backend() == "tpu":
        from consent_tpu.ops import align as align_ops
        from consent_tpu.ops import pallas_align as pa

        cq = jnp.asarray(frags[:2].reshape(2 * S, Lf).astype(np.int32))
        cql = jnp.asarray(frag_len[:2].reshape(2 * S))
        cr = jnp.asarray(np.repeat(tpl[:2], S, axis=0).astype(np.int32))
        crl = jnp.asarray(np.full(2 * S, W, np.int32))
        cd0 = jnp.zeros(2 * S, jnp.int32)
        got = pa.pallas_banded_posterior_summary(cq, cql, cr, crl, cd0,
                                                 scoring)
        want = align_ops.posterior_summary(cq, cql, cr, crl, scoring,
                                           d0=cd0)
        for name in got._fields:
            a, b = np.asarray(getattr(got, name)), np.asarray(
                getattr(want, name))
            assert np.array_equal(a, b), f"Pallas!=XLA on {name}"

    import functools

    from consent_tpu.config import correct_preset

    WARM = correct_preset().warm_frac   # production warm-round depth

    @functools.partial(jax.jit, static_argnames=("rounds",))
    def fused(fr, rounds):
        v, w_len = cons_ops.consensus_votes_rounds(
            fr, fl_d, tpl_d, tl_d, S=S, rounds=rounds,
            min_column_support=2, scoring=scoring, warm_frac=WARM,
        )
        return v, w_len

    def chain(k, fr, rounds=1):
        out = None
        for _ in range(k):
            if rounds == 1:
                out = cons_ops.consensus_votes(
                    fr, fl_d, tpl_d, tl_d, S=S, min_column_support=2,
                    scoring=scoring,
                )
                col = out.col_base
            else:
                out, _ = fused(fr, rounds)
                col = out.col_base
            # data dependency so calls can't overlap or be elided
            fr = (fr + col[:, None, :].astype(jnp.uint8)) % 4
        return jax.device_get(out.col_base).sum()

    def slope(rounds):
        chain(1, frags_d, rounds)  # compile
        chain(4, frags_d, rounds)  # warm
        per_calls = []
        for _ in range(5):  # repeated chain-slope measurements
            # long chains (2 vs 10 calls, slope over the 8-call
            # difference): the tunnel's per-dispatch latency jitter
            # cancels in the difference and amortizes over 8 calls
            # instead of 3 — the round-to-round spread through the
            # access tunnel was ±20% with (1, 4)-call chains
            t0 = time.perf_counter()
            chain(2, frags_d, rounds)
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            chain(10, frags_d, rounds)
            t_long = time.perf_counter() - t0
            per_calls.append(max(1e-9, (t_long - t_short) / 8))
        return per_calls

    per_calls = slope(1)
    per_call = float(np.median(per_calls))
    wps = B / per_call
    # the production composite: consensus_rounds=2 runs FUSED in one
    # dispatch (engine.py); measure that executable, not value/2
    fused_calls = slope(2)
    fused_call = float(np.median(fused_calls))
    wps2 = B / fused_call
    print(
        json.dumps(
            {
                "metric": "consensus_windows_per_s",
                "value": round(wps, 2),
                "unit": "windows/s",
                "vs_baseline": round(wps / BASELINE_WINDOWS_PER_S, 3),
                "n_reps": len(per_calls),
                "min_ms_per_call": round(min(per_calls) * 1e3, 3),
                "median_ms_per_call": round(per_call * 1e3, 3),
                "rounds2_windows_per_s": round(wps2, 2),
                "rounds2_vs_baseline": round(
                    wps2 / BASELINE_WINDOWS_PER_S, 3
                ),
                "rounds2_ms_per_call": round(fused_call * 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
