from photons_tpu.pm.mesh import cic_paint, cic_read_vector
from photons_tpu.pm.solver import green_function, pm_accel, pm_potential, gradient_4th

__all__ = [
    "cic_paint",
    "cic_read_vector",
    "green_function",
    "gradient_4th",
    "pm_accel",
    "pm_potential",
]
