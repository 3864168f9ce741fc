"""photoNs-TPU: a TPU-native TreePM cosmological N-body framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``photoNs-2.0_GPU-P2P-Redundancy`` (hybrid FMM + PM gravity solver for a
flat LambdaCDM universe, KDK leapfrog in log-a time), re-designed for TPU:

- particles live in sharded, statically-shaped device arrays (``SimState``);
- the kd-tree becomes a balanced binary tree over Morton-sorted,
  fixed-capacity leaf blocks (static shapes for XLA);
- FMM operators (P2M/M2M/M2L/L2L/L2P) are batched array ops;
- the dual-tree walk is a level-synchronized, vectorized frontier sweep;
- near-field P2P runs as Pallas kernels in two layouts mirroring the
  reference's "Indexing" and "Redundant" GPU variants;
- the long-range PM solve is a (shardable) FFT convolution;
- multi-chip parallelism uses ``jax.sharding`` + ``shard_map`` collectives
  (ppermute halo ring, all_gather top multipoles, all_to_all pencil FFT).

Reference layer map: see SURVEY.md at the repo root.
"""

from photons_tpu.config import SimConfig, load_parameter_file
from photons_tpu.state import SimState
from photons_tpu import cosmology

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "SimState",
    "cosmology",
    "load_parameter_file",
]
