"""Mesh construction and sharded consensus dispatch.

The reference's only parallelism is a CTPL thread pool over piles
(SURVEY.md §2b).  The TPU-native equivalents here:

  * `data` axis — windows of a batch sharded across devices (the
    embarrassingly-parallel read/window data parallelism),
  * `frag` axis — fragment slots of each window sharded across devices;
    the per-column vote reductions (sum over fragments) become XLA
    all-reduces over this axis, inserted automatically by GSPMD from
    the sharding annotations.

Multi-host runs shard piles across processes at the host level
(per-host PAF shards, concatenated outputs); inside each host this mesh
spans the local devices.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from consent_tpu.ops import align as align_ops
from consent_tpu.ops import consensus as cons_ops


def make_mesh(
    n_devices: Optional[int] = None,
    frag_axis: int = 1,
) -> Mesh:
    """1- or 2-axis mesh over local devices: (data, frag)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % frag_axis == 0, (n, frag_axis)
    arr = np.array(devs[:n]).reshape(n // frag_axis, frag_axis)
    return Mesh(arr, ("data", "frag"))


def shard_votes_inputs(mesh: Mesh, frags, frag_len, tpl, tpl_len):
    """Place consensus inputs: windows over `data`, fragment slots over
    `frag`, templates replicated along `frag`."""
    fr = jax.device_put(frags, NamedSharding(mesh, P("data", "frag", None)))
    fl = jax.device_put(frag_len, NamedSharding(mesh, P("data", "frag")))
    tp = jax.device_put(tpl, NamedSharding(mesh, P("data", None)))
    tl = jax.device_put(tpl_len, NamedSharding(mesh, P("data")))
    return fr, fl, tp, tl


def sharded_consensus_step(
    mesh: Mesh,
    frags,
    frag_len,
    tpl,
    tpl_len,
    *,
    S: int,
    min_column_support: int = 2,
    scoring: align_ops.Scoring = align_ops.Scoring(),
) -> cons_ops.WindowVotes:
    """One device-parallel consensus step: inputs sharded over
    (data, frag); GSPMD turns the fragment-sum vote reductions into
    all-reduces over the `frag` axis."""
    fr, fl, tp, tl = shard_votes_inputs(mesh, frags, frag_len, tpl, tpl_len)
    with jax.sharding.set_mesh(mesh):
        return cons_ops.consensus_votes(
            fr, fl, tp, tl,
            S=S, min_column_support=min_column_support, scoring=scoring,
        )
