"""Utilities: profiling/metering, logging."""

from force2vec_tpu.utils.profiling import Meter, phase_timer, trace

__all__ = ["Meter", "phase_timer", "trace"]
