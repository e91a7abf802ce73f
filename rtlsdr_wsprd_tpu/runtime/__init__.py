"""Host runtime: IQ file IO, synthetic sources, scheduler, daemons.

Single-channel live daemon: ``scheduler.WsprDaemon`` (+ ``sources``);
many-channel integrated runtime: ``multidaemon.MultiChannelDaemon``
over a ``banks.RawBank`` (imported lazily to keep ``import
rtlsdr_wsprd_tpu.runtime`` backend-clean and cheap)."""

from .iqio import (  # noqa: F401
    normalize_minus3db,
    read_c2_file,
    read_iq_file,
    write_c2_file,
    write_iq_file,
)
from .synth import (  # noqa: F401
    add_awgn,
    selftest_iq,
    synth_wspr_baseband,
    synth_window_at_snr,
)
