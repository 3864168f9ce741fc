"""Real-TPU smoke of the new constructs: refine(4,2) P2P + new CIC."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, numpy as np, jax.numpy as jnp
from photons_tpu.config import SimConfig
from photons_tpu.ops.fmm_engine import fmm_forces
from photons_tpu.pm.solver import green_function

cfg = SimConfig(boxsize=50.0, n_side=32, n_part_total=32768,
                dtype="float32", leaf_size=256, open_cap_per_node=128,
                p2p_neighbor_cap=96, cic_backend="pallas")
rng = np.random.default_rng(7)
pos = jnp.asarray(rng.uniform(0, 50.0, (32768, 3)), jnp.float32)
gf = green_function(cfg.n_side, cfg.boxsize, cfg.split_radius,
                    dtype=jnp.float32)
ref, _ = jax.jit(lambda p: fmm_forces(p, cfg, p2p_backend="jnp"))(pos)
(acc, acc_pm), diag = jax.jit(
    lambda p: fmm_forces(p, cfg, p2p_backend="indexing", pm_gf=gf))(pos)
acc, acc_pm, ref = map(np.asarray, (acc, acc_pm, ref))
rms = float(np.sqrt((ref**2).sum(-1)).mean())
dev = np.abs(acc - ref).max() / rms
print(f"TPU smoke: refine-indexing vs jnp max/rms {dev:.3e}, "
      f"pm finite {np.isfinite(acc_pm).all()}, overflow {int(diag['overflow'])}")
assert dev < 2e-3 and np.isfinite(acc_pm).all()

# PM parity: the Pallas tree-riding CIC (at the active PHOTONS_CIC_-
# PRECISION) against the XLA scatter/gather CIC -- the accuracy gate
# for the bf16 contraction A/B
from photons_tpu.pm.solver import pm_accel
pm_x = np.asarray(jax.jit(
    lambda p: pm_accel(p, gf, mass=cfg.particle_mass, boxsize=cfg.boxsize,
                       n_side=cfg.n_side))(pos))
pm_rms = float(np.sqrt((pm_x ** 2).sum(-1)).mean())
pm_dev_rms = float(np.sqrt(((acc_pm - pm_x) ** 2).mean())) * np.sqrt(3) / pm_rms
pm_dev_max = float(np.abs(acc_pm - pm_x).max()) / pm_rms
tot_rms = float(np.sqrt(((ref + pm_x) ** 2).sum(-1)).mean())
print(f"TPU smoke: pallas-CIC vs XLA-CIC pm rel rms {pm_dev_rms:.3e} "
      f"max {pm_dev_max:.3e} (pm rms / total rms {pm_rms / tot_rms:.2f})")
assert pm_dev_rms < 5e-3
print("TPU smoke OK")
