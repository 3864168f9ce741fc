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
print("TPU smoke OK")
