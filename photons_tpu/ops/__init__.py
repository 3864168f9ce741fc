from photons_tpu.ops.kernels import short_range_factor, pair_accel
from photons_tpu.ops.direct import direct_forces, ewald_forces

__all__ = ["short_range_factor", "pair_accel", "direct_forces", "ewald_forces"]
