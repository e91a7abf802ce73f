"""Pallas TPU kernel for the stage-1 polyphase decimator (the hot path).

At 2.4 Msps per channel this is the framework's streaming
speed-of-light op: HBM traffic should be ~1 input read + 1/80th output
write per sample. The kernel keeps the input in HBM/ANY space, DMAs
each program's frame slice (with the tpp-1 row halo) into VMEM double
Pallas-managed scratch, and evaluates the whole chunk as ONE
(F_BLK, 2T) @ (2T, 2) float32 matmul — the same contraction as
decimate._polyphase_chunked, so the two paths are interchangeable and
cross-checked in tests.

The reference's equivalent inner loop is rtlsdr_wsprd.c:184-218 (CIC
integrator/comb per sample); there is no C to imitate here — the
polyphase form exists *because* of the MXU.

STATUS — demoted to a flag-gated alternative (default OFF everywhere).
The production path is decimate._polyphase_pp: its partial-product
formulation reads every input sample exactly once at the HLO level, so
XLA's fused emission is already at the streaming-bandwidth limit this
kernel was written to reach, without the im2col VMEM staging (which
replays each sample tpp=8x into the matmul operand). Mosaic also does
not compile through this container's tunneled backend (remote_compile
HTTP 500 — tests exercise the kernel in interpret mode,
tests/test_frontend.py::test_pallas_matches_xla); on hosts with a
local TPU runtime, enable with use_pallas=True and compare with
tools/roofline.py before shipping it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from functools import lru_cache

from .filters import R1, STAGE1_TAPS, combined_matrix, conv_order, stage1_coeffs


@lru_cache(maxsize=1)
def _m1():
    """Stage-1 (2T, 2) combined matmul matrix (numpy). The in-kernel
    im2col happens in VMEM, so unlike the HBM-level XLA path this
    contraction shape costs no extra HBM traffic."""
    return combined_matrix(conv_order(stage1_coeffs()))

F_BLK = 512                      # output frames per grid program
TPP = STAGE1_TAPS // R1          # taps per phase = 8


def _kernel(xI_hbm, xQ_hbm, m_ref, out_ref, scrI, scrQ, sems):
    i = pl.program_id(0)
    rows = F_BLK + TPP - 1

    cpI = pltpu.make_async_copy(
        xI_hbm.at[pl.ds(i * F_BLK, rows), :], scrI, sems.at[0])
    cpQ = pltpu.make_async_copy(
        xQ_hbm.at[pl.ds(i * F_BLK, rows), :], scrQ, sems.at[1])
    cpI.start()
    cpQ.start()
    cpI.wait()
    cpQ.wait()

    # im2col via tpp static slices of the row-reshaped input:
    # X[:, t*R:(t+1)*R] = rows[t : t+F_BLK], column k = t*R + r holds
    # x[(m+t)*R + r] = x[m*R + k]  (correlation order)
    XI = jnp.concatenate([scrI[t:t + F_BLK, :] for t in range(TPP)], axis=1)
    XQ = jnp.concatenate([scrQ[t:t + F_BLK, :] for t in range(TPP)], axis=1)
    X = jnp.concatenate([XI, XQ], axis=1)          # (F_BLK, 2T)
    out_ref[:, :] = jnp.dot(X, m_ref[:, :],
                            preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("n_frames", "interpret"))
def decimate_stage1_pallas(
    xI: jnp.ndarray, xQ: jnp.ndarray, n_frames: int,
    interpret: bool = False,
):
    """float32[n_frames*R1 + STAGE1_TAPS - R1] planar -> planar
    (float32[n_frames], float32[n_frames]).

    Numerically identical contraction to decimate_stage1_xla (same
    filter matrix, same frame alignment).
    """
    M1 = _m1()                                     # (2T, 2) float32
    grid = pl.cdiv(n_frames, F_BLK)
    rows_needed = grid * F_BLK + TPP - 1
    have_rows = xI.shape[0] // R1

    rI = xI[: have_rows * R1].reshape(have_rows, R1)
    rQ = xQ[: have_rows * R1].reshape(have_rows, R1)
    pad = rows_needed - have_rows
    if pad > 0:
        rI = jnp.pad(rI, ((0, pad), (0, 0)))
        rQ = jnp.pad(rQ, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # filter, replicated
        ],
        out_specs=pl.BlockSpec(
            (F_BLK, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * F_BLK, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((F_BLK + TPP - 1, R1), jnp.float32),
            pltpu.VMEM((F_BLK + TPP - 1, R1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * grid * F_BLK * 2 * STAGE1_TAPS * 2,
            bytes_accessed=2 * rows_needed * R1 * 4 + grid * F_BLK * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rI, rQ, M1)
    return out[:n_frames, 0], out[:n_frames, 1]
