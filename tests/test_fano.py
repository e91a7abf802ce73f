"""Batched Fano decoder: bit-exactness against the reference C oracle."""

import ctypes

import numpy as np
import pytest

import jax.numpy as jnp

from rtlsdr_wsprd_tpu.ops.fano import batched_fano, build_mettab
from rtlsdr_wsprd_tpu.utils.channel import (
    PR3_VECTOR,
    deinterleave,
    get_wspr_channel_symbols,
)
from rtlsdr_wsprd_tpu.utils.hashtable import WsprHashTable

from oracle import _build as _build_oracle  # noqa: PLC2701

MET = build_mettab()


@pytest.fixture(scope="module")
def ref_fano():
    lib_path = _build_oracle()
    if lib_path is None:
        pytest.skip("reference oracle unavailable")
    lib = ctypes.CDLL(str(lib_path))
    lib.fano.restype = ctypes.c_int
    mettab_c = np.ascontiguousarray(MET, dtype=np.int32)

    def run(symbols, delta=60, maxcycles=10000):
        metric = ctypes.c_uint(0)
        cycles = ctypes.c_uint(0)
        maxnp = ctypes.c_uint(0)
        data = (ctypes.c_ubyte * 11)()
        sym = np.ascontiguousarray(symbols, dtype=np.uint8)
        r = lib.fano(
            ctypes.byref(metric), ctypes.byref(cycles), ctypes.byref(maxnp),
            data, sym.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.c_uint(81),
            mettab_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.c_int(delta), ctypes.c_uint(maxcycles),
        )
        return r == 0, bytes(data), metric.value, cycles.value, maxnp.value

    return run


def test_mettab_golden():
    # spot values from the compiled reference construction
    assert MET.shape == (2, 256)
    # NB [0,127]: C roundf narrows its double argument to float32 first,
    # so -4.4999999 -> -4.5f -> -5
    assert MET[0, 0] == 5 and MET[0, 127] == -5
    assert list(MET[0, 250:]) == [-120, -121, -124, -123, -126, -137]
    np.testing.assert_array_equal(MET[1], MET[0][::-1])


def _soft_cases(rng):
    ht = WsprHashTable()
    chan = get_wspr_channel_symbols("K1JT FN20QI 20", ht)
    bits = ((chan - PR3_VECTOR) // 2).astype(np.uint8)
    clean = deinterleave((bits * 255).astype(np.uint8))
    cases = [("clean", clean, 10000)]
    for sigma in (20, 40, 60, 80):
        base = deinterleave(bits.astype(np.float64) * 255)
        noisy = np.clip(base + rng.normal(0, sigma, 162), 0, 255).astype(np.uint8)
        cases.append((f"noisy{sigma}", noisy, 10000))
    for k in range(3):
        cases.append((f"garbage{k}", rng.integers(0, 256, 162, dtype=np.uint8), 30))
    return cases


def test_fano_bit_exact_vs_reference(ref_fano, rng):
    """Every decodable lane must match the C in success flag, decoded
    bytes, path metric, cycle count and deepest node; timeout lanes
    match except data bytes past maxnp, where the C reads uninitialized
    malloc memory (wsprd/fano.c:227-230 after a timeout — UB we do not
    replicate)."""
    for name, soft, mc in _soft_cases(rng):
        ok_r, data_r, met_r, cyc_r, mnp_r = ref_fano(soft, maxcycles=mc)
        res = batched_fano(jnp.asarray(soft[None, :]), jnp.asarray(MET),
                           delta=60, maxcycles=mc)
        assert bool(res.success[0]) == ok_r, name
        assert int(np.uint32(np.asarray(res.metric[0]))) == met_r, name
        assert int(res.cycles[0]) == cyc_r, name
        assert int(res.maxnp[0]) == mnp_r, name
        if ok_r:
            assert bytes(np.asarray(res.data[0])) == data_r, name


def test_fano_batch_lanes_independent(rng):
    """Lane results must not depend on batch composition."""
    cases = _soft_cases(rng)
    softs = np.stack([c[1] for c in cases if c[2] == 10000])
    full = batched_fano(jnp.asarray(softs), jnp.asarray(MET))
    for k in range(softs.shape[0]):
        solo = batched_fano(jnp.asarray(softs[k : k + 1]), jnp.asarray(MET))
        assert bool(solo.success[0]) == bool(full.success[k])
        np.testing.assert_array_equal(np.asarray(solo.data[0]),
                                      np.asarray(full.data[k]))
        assert int(solo.cycles[0]) == int(full.cycles[k])


def test_fano_roundtrip_all_message_types():
    ht = WsprHashTable()
    for msg in ["K1JT FN20QI 20", "PJ4/K1ABC 37", "<K1ABC> EN50WC 33"]:
        chan = get_wspr_channel_symbols(msg, ht)
        bits = ((chan - PR3_VECTOR) // 2).astype(np.uint8)
        soft = deinterleave((bits * 255).astype(np.uint8))
        res = batched_fano(jnp.asarray(soft[None, :]), jnp.asarray(MET))
        assert bool(res.success[0]), msg
