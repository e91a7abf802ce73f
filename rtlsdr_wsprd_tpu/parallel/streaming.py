"""Sequence-parallel streaming front end: time-axis sharding with
overlap-save halo exchange.

The reference processes its 2.4 Msps stream on one core
(rtlsdr_wsprd.c:126-244). When a single stream (or a fused multi-band
stream) outgrows one chip's ingest, the TPU-native scaling axis is the
TIME dimension: shard the raw sample axis over the mesh, and exchange
the (taps - R) filter-boundary samples between ring neighbors with one
``ppermute`` — the context/sequence-parallel analog for DSP
(SURVEY.md section 5 "long-context / sequence parallelism").

Each shard then runs the identical local polyphase program
(frontend/decimate.py), so results are bit-identical to the unsharded
kernel except the last (taps/R - 1) frames of the final shard, whose
halo wraps circularly — callers either pad the input or drop them
(``valid_frames`` says how many are exact).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..frontend.decimate import _polyphase_pp, _pp_mats
from ..frontend.filters import R1, STAGE1_TAPS


def valid_frames(total_samples: int) -> int:
    """Frames whose inputs never wrap past the end of the stream."""
    return (total_samples - (STAGE1_TAPS - R1)) // R1


@partial(jax.jit, static_argnames=("mesh", "axis"))
def decimate_stage1_sharded(
    xI: jnp.ndarray,
    xQ: jnp.ndarray,
    mesh: Mesh,
    axis: str = "seq",
):
    """Stage-1 polyphase over a time-sharded raw stream.

    xI/xQ: float32[L] with L a multiple of mesh.size * R1. Returns
    planar (float32[L/R1], float32[L/R1]); the trailing
    (STAGE1_TAPS/R1 - 1) frames wrap circularly (see module docstring).
    """
    n = mesh.shape[axis]
    L = xI.shape[0]
    assert L % (n * R1) == 0, (L, n)
    halo = STAGE1_TAPS - R1
    frames_local = L // (n * R1)
    H1t, H1b, _, _ = _pp_mats()
    perm = [(i, (i - 1) % n) for i in range(n)]  # shard i -> i-1 (left)

    def local(xi, xq):
        # receive the right neighbor's first `halo` samples
        hi = jax.lax.ppermute(xi[:halo], axis, perm)
        hq = jax.lax.ppermute(xq[:halo], axis, perm)
        fi = jnp.concatenate([xi, hi])
        fq = jnp.concatenate([xq, hq])
        return _polyphase_pp(fi, fq, H1t, H1b, frames_local)

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P(axis)),
                   out_specs=(P(axis), P(axis)))
    return fn(xI, xQ)
