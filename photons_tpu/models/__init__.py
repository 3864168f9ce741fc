from photons_tpu.models.lcdm import demo_lcdm, lcdm_config
from photons_tpu.models.merger import demo_merger, merger_config

__all__ = ["demo_lcdm", "demo_merger", "lcdm_config", "merger_config"]
