from photons_tpu.utils.timers import PhaseTimers
from photons_tpu.utils.logging import RunLog

__all__ = ["PhaseTimers", "RunLog"]
