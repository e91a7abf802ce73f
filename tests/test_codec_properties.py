"""Property-based codec tests (hypothesis).

The reference's unit tests pin a handful of fixed cases
(tests/test_wsprd.c); these sweep the whole input space for round-trip
and determinism invariants (SURVEY.md section 5, race detection /
sanitizers: "hypothesis tests for codecs").
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from rtlsdr_wsprd_tpu.utils.channel import (
    conv_encode,
    deinterleave,
    get_wspr_channel_symbols,
    interleave,
    pack_call,
)
from rtlsdr_wsprd_tpu.utils.codec import unpackcall, unpackgrid
from rtlsdr_wsprd_tpu.utils.hashtable import WsprHashTable
from rtlsdr_wsprd_tpu.utils.nhash import nhash

# standard type-1 callsign shape the packers accept:
# [A-Z0-9]? [A-Z0-9] digit [A-Z]{0,3}
_calls = st.from_regex(r"\A[A-Z0-9][A-Z0-9]?[0-9][A-Z]{1,3}\Z",
                       fullmatch=True)
_grids = st.from_regex(r"\A[A-R][A-R][0-9][0-9]\Z", fullmatch=True)
_powers = st.integers(min_value=0, max_value=60)


@settings(max_examples=200, deadline=None)
@given(_calls)
def test_callsign_pack_unpack_roundtrip(call):
    n = pack_call(call)
    if n is None:
        return  # packers may reject; never crash
    back = unpackcall(n)
    assert back is not None
    assert back.strip() == call


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=32767))
def test_unpackgrid_total(ngrid):
    # every 15-bit input either yields a well-formed grid/dBm form or
    # None — never an exception (decoder feeds arbitrary bits here)
    g = unpackgrid(ngrid)
    assert g is None or isinstance(g, str)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=24))
def test_nhash_deterministic_and_15bit(key):
    h1 = nhash(key)
    h2 = nhash(key)
    assert h1 == h2
    assert 0 <= h1 < 32768


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 3), min_size=162, max_size=162))
def test_interleave_roundtrip(sym):
    a = np.asarray(sym, np.uint8)
    assert np.array_equal(deinterleave(interleave(a)), a)
    assert np.array_equal(interleave(deinterleave(a)), a)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=11, max_size=11))
def test_conv_encode_shape_and_determinism(data):
    s1 = conv_encode(data)
    s2 = conv_encode(data)
    assert s1.shape == (176,)
    assert np.array_equal(s1, s2)
    assert set(np.unique(s1)).issubset({0, 1})


@settings(max_examples=60, deadline=None)
@given(_calls, _grids, _powers)
def test_channel_symbols_valid(call, grid, power):
    msg = f"{call} {grid} {power}"
    sym = get_wspr_channel_symbols(msg, WsprHashTable())
    if sym is None:
        return
    assert sym.shape == (162,)
    assert sym.min() >= 0 and sym.max() <= 3
    # sync vector is embedded: (sym - pr3) must be even (2*bit + pr3)
    from rtlsdr_wsprd_tpu.utils.channel import PR3_VECTOR
    assert np.all((sym - PR3_VECTOR) % 2 == 0)
