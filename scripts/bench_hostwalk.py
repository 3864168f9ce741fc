#!/usr/bin/env python
"""Measure the host-walk pipeline against the in-jit traversal engine
(VERDICT round-1 item 8 / SURVEY.md section 2.4 axis 4: dual buffering).

Runs N steps of the flagship LCDM config with both engines and prints
s/step plus the pipeline's phase split (tree build / host walk / force
apply), so the walk-overlap question is answered with a measurement.

Usage:
    python scripts/bench_hostwalk.py --n 64 --steps 10
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--backend", default=None,
                    help="p2p backend (default: redundant on TPU, jnp else)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = args.backend or ("redundant" if jax.default_backend() == "tpu"
                               else "jnp")

    from photons_tpu.ics import ic_zeldovich
    from photons_tpu.models.lcdm import lcdm_config
    from photons_tpu.pipeline import PipelinedSimulation
    from photons_tpu.sim import Simulation

    n = args.n
    cfg = lcdm_config(n_part=n ** 3, n_side=n, leaf_size=args.leaf_size,
                      dtype="float32", open_cap_per_node=128,
                      p2p_neighbor_cap=96, m2l_cap_per_node=64)
    pos, vel = ic_zeldovich(cfg, seed=7, spectral_index="lcdm")
    a1 = cfg.initial_scale_factor * 1.2

    def timed(label, sim):
        sim.run(n_steps=1, a_final=cfg.initial_scale_factor * 1.02)  # compile
        t0 = time.perf_counter()
        sim.run(n_steps=args.steps, a_final=a1)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{label:>10}: {dt * 1e3:8.1f} ms/step")
        return dt

    print(f"N={n}^3 backend={backend} device={jax.devices()[0].platform}")
    sim_jit = Simulation.from_arrays(cfg, pos, vel, engine=f"fmm-{backend}")
    t_jit = timed("in-jit", sim_jit)

    sim_pipe = PipelinedSimulation.from_arrays(cfg, pos, vel,
                                               p2p_backend=backend)
    t_pipe = timed("pipeline", sim_pipe)
    tm = sim_pipe.timers
    print("pipeline phases (ms/call): "
          + " ".join(f"{k}={v / max(1, tm.counts[k]) * 1e3:.1f}"
                     for k, v in tm.totals.items() if k != "step"))
    print(f"pipeline/in-jit: {t_pipe / t_jit:.2f}x "
          f"({'pipeline wins' if t_pipe < t_jit else 'in-jit wins'})")


if __name__ == "__main__":
    main()
