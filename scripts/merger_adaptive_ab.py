#!/usr/bin/env python
"""Block-adaptive vs fixed stepping A/B on the packaged merger
(VERDICT r3 next-5).

The round-4 64^3 cosmological A/B was an honest negative: coarse macros
under-integrate linear growth, so refinement cannot buy the growth ODE
back (BENCH_NOTES).  The merger family has NO background growth -- its
demand is concentrated in the two Plummer cores -- which is exactly the
shape per-particle block refinement (inc/adaptive.h:12-20) is for:
coarse macros for the 40k-halo background, deep substeps for the cores,
the whole macro ladder in ONE device dispatch (sim.make_ladder).

Protocol: all runs integrate the packaged ic_merger.gdt2 to t_final.
  truth     fixed stepping at 4x the reference cadence (400 steps)
  fixed     the reference cadence (100 steps; ref_lcdm parity run)
  adaptive  N_macro coarse macros + block refinement at --eta
Each run records per-type COM / rms-radius trajectories, total energy
(chunked direct-sum potential at matched softening), wall-clock, and
force evaluations.  'Win' = adaptive wall < fixed wall AND adaptive
trajectory/energy error vs truth <= fixed's.

Usage:
    python scripts/merger_adaptive_ab.py                  # TPU, full IC
    python scripts/merger_adaptive_ab.py --subsample 16 --cpu --t-final 0.2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_IC = "/root/reference/1_Indexing/demo/ic_merger.gdt2"


def total_energy(pos, vel, mass, eps, grav):
    """KE + PE by chunked direct sum (clamp softening, matching the P2P
    kernel's r<eps clamp -- photoNs_CUDA.cu:346-351)."""
    import jax
    import jax.numpy as jnp

    p = jnp.asarray(pos, jnp.float32)
    n = p.shape[0]
    ke = 0.5 * mass * float(np.sum(np.asarray(vel, np.float64) ** 2))

    @jax.jit
    def pe_chunk(rows):
        d = rows[:, None, :] - p[None, :, :]
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        inv = jnp.where(r > 0, 1.0 / jnp.maximum(r, eps), 0.0)
        return jnp.sum(inv, axis=1)

    chunk = 4096
    pe = 0.0
    for s0 in range(0, n, chunk):
        pe += float(jnp.sum(pe_chunk(p[s0:s0 + chunk])))
    return ke - 0.5 * grav * mass * mass * pe


def traj_rows(sim, n1):
    pos = np.asarray(sim.state.pos)
    vel = np.asarray(sim.state.vel)
    if sim.state.ids is not None:
        order = np.argsort(np.asarray(sim.state.ids))
        pos, vel = pos[order], vel[order]
    return pos, vel, {
        "t": float(sim.state.a),
        "com1": pos[:n1].mean(0).tolist(),
        "com2": pos[n1:].mean(0).tolist(),
        "rms_r1": float(np.sqrt(((pos[:n1] - pos[:n1].mean(0)) ** 2)
                                .sum(-1).mean())),
        "rms_r2": float(np.sqrt(((pos[n1:] - pos[n1:].mean(0)) ** 2)
                                .sum(-1).mean())),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--t-final", type=float, default=1.0)
    ap.add_argument("--steps-fixed", type=int, default=100)
    ap.add_argument("--truth-mult", type=int, default=4)
    ap.add_argument("--macros", type=int, default=25)
    ap.add_argument("--eta", type=float, default=0.1)
    ap.add_argument("--max-level", type=int, default=6)
    ap.add_argument("--engine", default="fmm-indexing")
    ap.add_argument("--leaf-size", type=int, default=128)
    ap.add_argument("--subsample", type=int, default=1)
    ap.add_argument("--open-cap", type=int, default=512)
    ap.add_argument("--p2p-cap", type=int, default=576)
    ap.add_argument("--m2l-cap", type=int, default=256)
    ap.add_argument("--verlet-skin", type=float, default=0.8,
                    help="list-reuse drift margin for the ADAPTIVE run's "
                         "within-macro reuse, as a fraction of "
                         "cutoff_radius (the open-boundary proxy bound "
                         "fmm_forces_reuse monitors).  Macro dt = "
                         "t_final/macros drifts core particles tens of "
                         "kpc; the 0.1 default trips a rollback+replay "
                         "per macro (measured), so the A/B pre-sizes it")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from photons_tpu.models.merger import merger_from_reference

    n1 = 40000 // args.subsample      # type-1 slice after subsampling

    def build(adaptive=False):
        return merger_from_reference(
            REF_IC, engine=args.engine, subsample=args.subsample,
            dtype="float32", leaf_size=args.leaf_size, sorted_state=True,
            open_cap_per_node=args.open_cap,
            p2p_neighbor_cap=args.p2p_cap, m2l_cap_per_node=args.m2l_cap,
            verlet_skin=args.verlet_skin if adaptive else 0.1,
            output_path=args.out, code_proj="mergerab")

    runs = {}
    for name, steps, kw in (
            ("truth", args.steps_fixed * args.truth_mult, {}),
            ("fixed", args.steps_fixed, {}),
            ("adaptive", args.macros,
             dict(adaptive="block", eta=args.eta,
                  max_level=args.max_level))):
        sim = build(adaptive=bool(kw))
        cfg = sim.cfg
        t0 = time.perf_counter()
        sim.run(n_steps=steps, a_final=args.t_final, **kw)
        wall = time.perf_counter() - t0
        pos, vel, row = traj_rows(sim, n1)
        e = total_energy(pos, vel, cfg.particle_mass, cfg.soften_scale,
                         cfg.grav_const)
        nf = getattr(sim, "_ab_force_evals", None)
        runs[name] = dict(steps=steps, wall_s=wall, energy=e,
                          recoveries=sim.recoveries,
                          max_level=sim.max_adaptive_level,
                          final=row, pos=pos)
        lv = getattr(sim, "last_levels", None)
        print(f"{name}: {steps} steps, wall {wall:.1f}s, E={e:.4e}, "
              f"recoveries={sim.recoveries}, "
              f"levels={None if lv is None else lv.tolist()}", flush=True)

    truth = runs["truth"]["pos"]

    def err(name):
        d = np.sqrt(((runs[name]["pos"] - truth) ** 2).sum(-1))
        scale = np.sqrt(((truth - truth.mean(0)) ** 2).sum(-1).mean())
        return float(np.sqrt((d ** 2).mean()) / scale)

    e0 = runs["truth"]["energy"]
    out = {
        "ic": "ic_merger.gdt2", "subsample": args.subsample,
        "t_final": args.t_final, "engine": args.engine,
        "eta": args.eta, "macros": args.macros,
        "steps_fixed": args.steps_fixed,
        "truth_steps": args.steps_fixed * args.truth_mult,
        "wall_fixed_s": runs["fixed"]["wall_s"],
        "wall_adaptive_s": runs["adaptive"]["wall_s"],
        "wall_truth_s": runs["truth"]["wall_s"],
        "pos_err_fixed": err("fixed"),
        "pos_err_adaptive": err("adaptive"),
        "energy_truth": e0,
        "energy_drift_fixed": abs(runs["fixed"]["energy"] - e0) / abs(e0),
        "energy_drift_adaptive":
            abs(runs["adaptive"]["energy"] - e0) / abs(e0),
        "adaptive_max_level": runs["adaptive"]["max_level"],
        "recoveries": {k: runs[k]["recoveries"] for k in runs},
        "final_diagnostics": {k: runs[k]["final"] for k in runs},
    }
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "merger_adaptive_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in (
        "wall_fixed_s", "wall_adaptive_s", "pos_err_fixed",
        "pos_err_adaptive", "energy_drift_fixed",
        "energy_drift_adaptive")}))
    win = (out["wall_adaptive_s"] < out["wall_fixed_s"]
           and out["pos_err_adaptive"] <= 1.2 * out["pos_err_fixed"])
    print(f"adaptive {'WINS' if win else 'does not win'}: wall "
          f"{out['wall_adaptive_s']:.1f}s vs fixed "
          f"{out['wall_fixed_s']:.1f}s, pos err "
          f"{out['pos_err_adaptive']:.3e} vs {out['pos_err_fixed']:.3e}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
