#!/usr/bin/env python
"""Run a simulation from a parameter file (the reference's CLI:
``mpirun -np N ./photoNs-lcdm <paramfile> [verbosity]``,
1_Indexing/Makefile:55-58, photoNs.c:369-372).

Examples:
    python scripts/run_sim.py demo.run                      # full run
    python scripts/run_sim.py demo.run --engine fmm-redundant --steps 10
    python scripts/run_sim.py --model lcdm --steps 5        # built-in demo
    python scripts/run_sim.py --model merger --steps 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paramfile", nargs="?", help="photoNs-2 parameter file")
    ap.add_argument("--model", choices=["lcdm", "merger"], default="lcdm",
                    help="built-in demo family when no paramfile is given")
    ap.add_argument("--engine", default=None,
                    help="pm | direct | fmm | fmm-redundant | fmm-indexing "
                         "(default: fmm-redundant on TPU, fmm elsewhere)")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--a-final", type=float, default=None)
    ap.add_argument("--n-part", type=int, default=None)
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--verbosity", type=int, default=1,
                    help="0 silent, 1 banner+summary, 2 echo per-step log "
                         "rows (reference argv[2], photoNs.c:369-372)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--adaptive", choices=["off", "global", "block"],
                    default="off",
                    help="timestep refinement: 'global' = 2^k subcycling "
                         "of the whole system, 'block' = per-particle KDK "
                         "block levels (adaptive.h surface)")
    ap.add_argument("--eta", type=float, default=0.025,
                    help="timestep criterion dt <= eta*sqrt(eps/|a|)")
    ap.add_argument("--devices", type=int, default=0,
                    help="run multi-chip on an N-device mesh (the "
                         "reference's mpirun -np N); 0 = single device. "
                         "With --cpu, virtual host devices stand in for "
                         "the ICI mesh")
    args = ap.parse_args()

    if args.devices > 1 and args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.devices}")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    if args.engine is None:
        args.engine = ("fmm-redundant" if jax.default_backend() == "tpu"
                       else "fmm")

    from photons_tpu.config import load_parameter_file
    from photons_tpu.models import demo_lcdm, demo_merger
    from photons_tpu.sim import Simulation

    overrides = {}
    if args.n_part:
        overrides["n_part_total"] = args.n_part
    if args.dtype:
        overrides["dtype"] = args.dtype

    if args.devices > 1:
        # multi-chip driver: parameter file + sliced Gadget reads on a
        # device mesh (the reference's mpirun -np N entry, photoNs.c:358)
        import numpy as np
        from jax.sharding import Mesh
        from photons_tpu.parallel.step import ShardedSimulation

        if not args.paramfile:
            ap.error("--devices requires a parameter file")
        cfg = load_parameter_file(args.paramfile, **overrides)
        devs = np.array(jax.devices()[:args.devices])
        backend = ("redundant" if jax.default_backend() == "tpu" else "jnp")
        sim = ShardedSimulation.from_config(cfg, Mesh(devs, ("x",)),
                                            p2p_backend=backend)
        cfg = sim.cfg
        n_steps = args.steps if args.steps is not None else cfg.n_steps
        a_final = args.a_final if args.a_final is not None \
            else cfg.final_scale_factor
        if args.verbosity:
            print(f"photoNs-TPU | N={cfg.n_part_total} L={cfg.boxsize:g} "
                  f"nside={cfg.n_side} mesh={sim.mesh.devices.shape} "
                  f"a={float(sim.state.a):.4f} -> {a_final:.4f} "
                  f"({n_steps} steps) on {jax.devices()[0].platform}")
        t0 = time.perf_counter()
        sim.run(n_steps=n_steps, a_final=a_final, log=True,
                snapshot_times=cfg.snap_times if cfg.snap_times else None)
        dt = time.perf_counter() - t0
        path = sim.write_snapshot()
        if args.verbosity:
            print(f"done in {dt:.1f}s ({dt / max(n_steps, 1):.3f} s/step); "
                  f"snapshots -> {path}.0..{sim.mesh.devices.size - 1}")
            print("interactions:", {k: v.tolist()
                                    for k, v in sim.last_diag.items()})
        return

    if args.paramfile:
        cfg = load_parameter_file(args.paramfile, **overrides)
        sim = Simulation.from_config(cfg, engine=args.engine, log=True)
    elif args.model == "lcdm":
        sim = demo_lcdm(engine=args.engine, log=True, **overrides)
    else:
        sim = demo_merger(engine=args.engine, log=True, **overrides)
    cfg = sim.cfg
    if sim.log is not None:
        # verbosity 2+: echo every log row to stdout as it is written (the
        # reference's per-step timer print, photoNs.c:320-333, gated by
        # its argv[2] verbosity switch, photoNs.c:369-372)
        sim.log.echo = args.verbosity >= 2

    n_steps = args.steps if args.steps is not None else cfg.n_steps
    a_final = args.a_final if args.a_final is not None \
        else cfg.final_scale_factor

    if args.verbosity:
        print(f"photoNs-TPU | N={cfg.n_part_total} L={cfg.boxsize:g} "
              f"nside={cfg.n_side} engine={args.engine} "
              f"a={float(sim.state.a):.4f} -> {a_final:.4f} "
              f"({n_steps} steps) on {jax.devices()[0].platform}")

    adaptive = {"off": False, "global": True, "block": "block"}[args.adaptive]
    t0 = time.perf_counter()
    sim.run(n_steps=n_steps, a_final=a_final,
            snapshot_times=cfg.snap_times if cfg.snap_times else None,
            adaptive=adaptive, eta=args.eta)
    dt = time.perf_counter() - t0

    path = sim.write_snapshot()
    if args.verbosity:
        print(f"done in {dt:.1f}s ({dt / max(n_steps, 1):.3f} s/step); "
              f"snapshot -> {path}")
        print("phase timers:")
        print(sim.timers.report())
        if sim.last_diag:
            print("interactions:", sim.last_diag)


if __name__ == "__main__":
    main()
