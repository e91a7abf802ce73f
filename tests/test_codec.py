"""Host codec unit tests.

Ports the reference's 16-test C harness (tests/test_wsprd.c) to pytest
and adds bit-parity goldens captured from the compiled reference
(wsprd_utils.c / wsprsim_utils.c / nhash.c / fano.c built with gcc -O2).
"""

import numpy as np
import pytest

from rtlsdr_wsprd_tpu.utils import (
    METRIC_TABLES,
    PR3_VECTOR,
    WsprHashTable,
    conv_encode,
    deinterleave,
    get_callsign_character_code,
    get_locator_character_code,
    get_wspr_channel_symbols,
    interleave,
    nhash,
    pack_call,
    pack_grid4_power,
    pack_payload,
    unpack50,
    unpack_message,
    unpackcall,
    unpackgrid,
)


# ===== Character code helpers (tests/test_wsprd.c:58-74) =====

def test_callsign_character_codes():
    assert get_callsign_character_code("0") == 0
    assert get_callsign_character_code("9") == 9
    assert get_callsign_character_code("A") == 10
    assert get_callsign_character_code("Z") == 35
    assert get_callsign_character_code(" ") == 36


def test_locator_character_codes():
    assert get_locator_character_code("0") == 0
    assert get_locator_character_code("9") == 9
    assert get_locator_character_code("A") == 0
    assert get_locator_character_code("R") == 17
    assert get_locator_character_code(" ") == 36


# ===== pack_call / unpackcall round-trip (tests/test_wsprd.c:79-120) =====

@pytest.mark.parametrize("call", ["K1JT", "VA2GKA", "W1AW"])
def test_pack_unpack_call_roundtrip(call):
    n = pack_call(call)
    assert n > 0
    assert unpackcall(n) == call


# goldens from the compiled reference (gcc -O2, x86-64)
@pytest.mark.parametrize(
    "call,expected",
    [("K1JT", 259055063), ("VA2GKA", 221674590), ("W1AW", 261410543)],
)
def test_pack_call_golden(call, expected):
    assert pack_call(call) == expected


def test_pack_call_too_long():
    assert pack_call("TOOLONG1") == 0


def test_unpackcall_out_of_range():
    assert unpackcall(262177560) is None


# ===== grid (tests/test_wsprd.c:125-132) =====

def test_unpackgrid_out_of_range():
    assert unpackgrid(32400 << 7) is None


def test_unpackgrid_known():
    g4 = [get_locator_character_code(c) for c in "FN20"]
    m = pack_grid4_power(g4, 20)
    assert unpackgrid(m) == "FN20"


# ===== unpack50 (tests/test_wsprd.c:313-340) =====

def test_unpack50_roundtrip():
    n = pack_call("K1JT")
    g4 = [get_locator_character_code(c) for c in "FN20"]
    m = pack_grid4_power(g4, 20)
    data = pack_payload(n, m)
    assert data.hex() == "f70ddd7b39d50000000000"  # reference golden
    n1, n2 = unpack50(data)
    assert n1 == n
    assert n2 == m


# ===== interleave / deinterleave (tests/test_wsprd.c:137-163) =====

def test_interleave_deinterleave_identity():
    original = np.arange(162, dtype=np.uint8)
    work = interleave(original)
    assert not np.array_equal(work, original)
    assert np.array_equal(deinterleave(work), original)


# ===== convolutional encoder golden =====

REF_ENC_K1JT = (
    "1110111110001110010011010101011100010110111001100101101000001111"
    "1100000010111111010011111111010011011101011111000111110001000011"
    "110100010000111110000001001111000000000000000000"
)


def test_conv_encode_golden():
    data = bytes.fromhex("f70ddd7b39d50000000000")
    enc = conv_encode(data, 11)
    assert "".join(str(x) for x in enc) == REF_ENC_K1JT


# ===== nhash (tests/test_wsprd.c:225-240 + goldens) =====

def test_nhash_deterministic():
    assert nhash("K1JT") == nhash("K1JT")
    assert nhash("K1JT") != nhash("VA2GKA")


def test_nhash_within_hashtab_range():
    assert 0 <= nhash("K1JT") < 32768


@pytest.mark.parametrize(
    "s,expected",
    [
        ("K1JT", 14767), ("VA2GKA", 12125), ("W1AW", 5970),
        ("PJ4/K1ABC", 19735), ("A", 5593), ("B", 5262),
        ("LONGCALLSIGN0", 27509), ("X1", 31914), ("0123456789ABC", 25644),
    ],
)
def test_nhash_golden(s, expected):
    assert nhash(s) == expected


# ===== channel symbols (tests/test_wsprd.c:264-298 + goldens) =====

REF_SYMBOLS = {
    "K1JT FN20QI 20": "332020221020311022320301131002220210032120220232132031010203103020013032301012032212130003103030223222201201223312132013232223112020032322310220220332103100213022",
    "W1AW FN31PR 10": "332222021020313022322301333002020012030120220030312211032221123020033212121210210212112001301012221000021023221332130213212201312220210100312202220130301100033220",
    "VA2GKA FN35 37": "310222023200311222100101333002200030232322200012332011212003103222231030123232212230132003121032023002223021023132330231232201332222012102112202002330121322011202",
    "PJ4/K1ABC 37": "310220001022131020100123131220220230030322022010130031010003323222013010301210032032112203323030223022021023001310310031230021332000010120112222222132323102011022",
    "K1ABC/7 33": "330220001022131222100323113020200230032322022232130233030001323220013032301010012030130203123210203222001021001110310211210223132200030122112200202332123120031020",
    "K1ABC/22 47": "330022001020113220120321113222020032032320002210130233010003303222013232321210032030130203103032203222021023023310310233210023132000010122132022202332103322013220",
    "<K1ABC> EN50WC 33": "310002023200313022102321111022002232232122222012130211230003303002011230321212030210312001101032201002223201203132332231032023312202010120130022222110301320213202",
    "<PJ4/K1ABC> FK52UD 37": "332022223002133202300303131220222012032300200010310013210203103000211010103230210010130021123032201202221203021310130211012201112222032122310020000310101100011202",
}


@pytest.mark.parametrize("msg", sorted(REF_SYMBOLS))
def test_channel_symbols_golden(msg):
    ht = WsprHashTable()
    syms = get_wspr_channel_symbols(msg, ht)
    assert syms is not None
    assert syms.min() >= 0 and syms.max() <= 3
    assert "".join(str(x) for x in syms) == REF_SYMBOLS[msg]


def test_channel_symbols_differ():
    ht = WsprHashTable()
    s1 = get_wspr_channel_symbols("K1JT FN20QI 20", ht)
    s2 = get_wspr_channel_symbols("W1AW FN31PR 10", ht)
    assert not np.array_equal(s1, s2)


def test_pr3_vector_weight():
    # the sync vector has a fixed number of ones; symbols = 2*bit + pr3
    assert PR3_VECTOR.shape == (162,)
    assert set(np.unique(PR3_VECTOR)) <= {0, 1}


# ===== full unpk_ round-trip (tests/test_wsprd.c:345-384) =====

def test_unpk_roundtrip():
    n = pack_call("K1JT")
    g4 = [get_locator_character_code(c) for c in "FN20"]
    m = pack_grid4_power(g4, 20)
    data = pack_payload(n, m)
    ht = WsprHashTable()
    res = unpack_message(list(data), ht)
    assert res is not None
    assert not res.noprint
    assert res.call == "K1JT"
    assert res.loc == "FN20"
    assert res.pwr == "20"
    assert res.call_loc_pow == "K1JT FN20 20"
    # type-1 decode inserts the call into the hashtable
    assert ht.get_call(nhash("K1JT")) == "K1JT"


def test_unpk_type3_hash_lookup():
    ht = WsprHashTable()
    ht.put(nhash("K1ABC"), "K1ABC", None)
    syms = get_wspr_channel_symbols("<K1ABC> EN50WC 33", WsprHashTable())
    assert syms is not None
    # decode the payload directly: rebuild the 11 bytes
    from rtlsdr_wsprd_tpu.utils.channel import _snap_power  # noqa: PLC2701

    power = _snap_power(33)
    ntype = -(power + 1)
    mm = 128 * nhash("K1ABC") + ntype + 64
    nn = pack_call("N50WCE")
    data = pack_payload(nn, mm)
    res = unpack_message(list(data), ht)
    assert res is not None
    assert res.call == "<K1ABC>"
    assert res.loc == "EN50WC"
    assert res.pwr == "33"


def test_unpk_type3_unknown_hash():
    ht = WsprHashTable()
    power = 33
    ntype = -(power + 1)
    mm = 128 * nhash("K1ABC") + ntype + 64
    nn = pack_call("N50WCE")
    data = pack_payload(nn, mm)
    res = unpack_message(list(data), ht)
    assert res is not None
    assert res.call == "<...>"


# ===== metric tables =====

def test_metric_tables_shape_and_values():
    assert len(METRIC_TABLES) == 5
    assert all(len(t) == 256 for t in METRIC_TABLES)
    # spot checks against wsprd/metric_tables.h
    assert METRIC_TABLES[2][0] == pytest.approx(0.9999)
    assert METRIC_TABLES[2][127] == 0.0
    assert METRIC_TABLES[2][255] == pytest.approx(-13.2539)


# ===== hashtable persistence =====

def test_hashtable_roundtrip(tmp_path):
    ht = WsprHashTable()
    ht.put(nhash("K1JT"), "K1JT", "FN20")
    ht.put(nhash("W1AW"), "W1AW", None)
    p = tmp_path / "hashtable.txt"
    ht.save(p)
    ht2 = WsprHashTable.load(p)
    assert ht2.get_call(nhash("K1JT")) == "K1JT"
    assert ht2.get_grid(nhash("K1JT")) == "FN20"
    assert ht2.get_call(nhash("W1AW")) == "W1AW"
    assert len(ht2) == 2


def test_hashtable_malformed_rows(tmp_path):
    p = tmp_path / "hashtable.txt"
    p.write_text("notanint K1JT FN20\n99999 TOOBIG XX11\n   12 GOOD1 AB12\n\n")
    ht = WsprHashTable.load(p)
    assert len(ht) == 1
    assert ht.get_call(12) == "GOOD1"
