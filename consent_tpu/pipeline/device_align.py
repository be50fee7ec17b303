"""Batched device aligner for the stitcher.

Pads ragged (query, ref) pair lists into fixed-shape buckets (lane
count = power of two, lengths = multiples of 128) so jit caches stay
small, runs the posterior aligner, and returns host AlignSpans.

With a data mesh (ConsensusEngine.mesh), the lane batch is split over
the local devices via shard_map — the stitch rounds of many reads
align on all chips at once, mirroring the window-consensus sharding.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from consent_tpu.ops import align as align_ops
from consent_tpu.pipeline.stitch import STITCH_SCORING, AlignSpan

MAX_LANES_PER_CALL = 1024

_SCORING = align_ops.Scoring(
    match=STITCH_SCORING["match"],
    mismatch=STITCH_SCORING["mismatch"],
    gap_open=STITCH_SCORING["gap_open"],
    gap_extend=STITCH_SCORING["gap_extend"],
)


def _spans_body(q, ql, r, rl):
    from consent_tpu.ops.consensus import _summary_dispatch

    res = _summary_dispatch(q, ql, r, rl, _SCORING)
    s = align_ops.summary_spans(res)
    return s.q_begin, s.q_end, s.r_begin, s.r_end, s.valid


_spans_jit = jax.jit(_spans_body)


@functools.lru_cache(maxsize=None)
def _sharded_spans_fn(mesh: Mesh):
    fn = jax.shard_map(
        _spans_body,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data", None), P("data")),
        out_specs=(P("data"),) * 5,
        check_vma=False,
    )
    return jax.jit(fn)


def _round_up(x: int, m: int) -> int:
    return max(m, (x + m - 1) // m * m)


def _next_pow2(x: int) -> int:
    n = 8
    while n < x:
        n *= 2
    return n


def device_batch_align(qs: List[np.ndarray], rs: List[np.ndarray],
                       fixed_len: int | None = None,
                       mesh: Optional[Mesh] = None) -> List[AlignSpan]:
    """Align each (qs[i], rs[i]) pair locally on device; returns spans.

    fixed_len pins the padded sequence length so every call hits a
    cached executable (tunnel compiles are minutes); without it the
    lengths round up to the batch maxima."""
    out: List[AlignSpan] = []
    for lo in range(0, len(qs), MAX_LANES_PER_CALL):
        out.extend(_one_call(qs[lo : lo + MAX_LANES_PER_CALL],
                             rs[lo : lo + MAX_LANES_PER_CALL], fixed_len,
                             mesh))
    return out


def make_fixed_aligner(cfg, mesh: Optional[Mesh] = None) -> "BatchAlignFn":
    """Aligner with shapes pinned for one pipeline config (and sharded
    over the engine's data mesh when given)."""
    L = _round_up(
        max(cfg.window_size + 2 * cfg.window_overlap,
            cfg.window_size + cfg.frag_slack),
        128,
    )
    return functools.partial(device_batch_align, fixed_len=L, mesh=mesh)


def _one_call(qs, rs, fixed_len=None, mesh=None):
    n = len(qs)
    lanes = _next_pow2(n)
    if mesh is not None:
        nd = mesh.devices.size
        lanes = nd * _next_pow2(-(-n // nd))
    Lq = _round_up(max(len(q) for q in qs), 128)
    Lr = _round_up(max(len(r) for r in rs), 128)
    if fixed_len is not None:
        Lq = max(Lq, fixed_len)
        Lr = max(Lr, fixed_len)
    q = np.zeros((lanes, Lq), dtype=np.uint8)
    r = np.zeros((lanes, Lr), dtype=np.uint8)
    ql = np.zeros(lanes, dtype=np.int32)
    rl = np.zeros(lanes, dtype=np.int32)
    for i, (a, b) in enumerate(zip(qs, rs)):
        q[i, : len(a)] = a
        r[i, : len(b)] = b
        ql[i] = len(a)
        rl[i] = len(b)
    if mesh is not None:
        sh2 = NamedSharding(mesh, P("data", None))
        sh1 = NamedSharding(mesh, P("data"))
        args = (
            jax.device_put(q, sh2), jax.device_put(ql, sh1),
            jax.device_put(r, sh2), jax.device_put(rl, sh1),
        )
        qb, qe, rb, re, valid = jax.device_get(_sharded_spans_fn(mesh)(*args))
    else:
        qb, qe, rb, re, valid = jax.device_get(
            _spans_jit(jnp.array(q), jnp.array(ql), jnp.array(r),
                       jnp.array(rl))
        )
    return [
        AlignSpan(int(qb[i]), int(qe[i]), int(rb[i]), int(re[i]), bool(valid[i]))
        for i in range(n)
    ]
