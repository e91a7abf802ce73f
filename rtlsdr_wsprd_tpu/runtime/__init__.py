"""Host runtime: IQ file IO, synthetic sources, scheduler, daemon."""

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
