"""Simulation driver: KDK leapfrog in log-a time (the reference's
``driver()``, photoNs.c:35-356, re-done as a functional jitted step).

Step structure (photoNs.c:146-339):

  per step i over [loga_i, loga_f]:
    dk = kick_loga, dd = drift_loga;  dkh = 0.5 * dk * G
    vel += (acc + acc_pm) * dkh          # half kick with previous forces
    pos += vel * dd;  periodic wrap
    recompute (acc, acc_pm)              # FMM/direct short + PM long
    vel += (acc + acc_pm) * dkh          # closing half kick

Forces are computed once before the loop (photoNs.c:95-132) so the first
half-kick has forces to use.  G enters only through dkh (photoNs.c:161).

The whole step is one ``jit``-ed function; dk/dd are traced scalars so a
single compilation serves every step.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from photons_tpu import cosmology
from photons_tpu.config import SimConfig
from photons_tpu.io.gadget import GadgetHeader, write_gadget
from photons_tpu.pm.solver import green_function, pm_accel
from photons_tpu.state import SimState, make_state, wrap_periodic
from photons_tpu.utils.logging import RunLog
from photons_tpu.utils.timers import PhaseTimers

# (pos) -> (acc_short, acc_pm, diag); diag is a dict of scalar diagnostics
# (interaction counts, traversal-capacity overflow flag).  Sorted-state
# force fns (fn.sorted == True) instead return
# (pos_sorted, acc, acc_pm, perm, diag), all in tree order.
ForceFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array, dict]]

# donated input: the pre-sort array is dead once its rows are gathered
# into the new order, and holding both copies during the gather tipped
# the 512^3 initial force over HBM (state + sorted copy ~12 GB)
_gather_rows = jax.jit(lambda x, perm: x[perm], donate_argnums=0)


class CapacityOverflowError(RuntimeError):
    """A static capacity (traversal frontier, M2L list, P2P neighbor table,
    CIC brick tile, ...) was exceeded; results since the last verified state
    are invalid.  ``kind`` tells the elastic recovery which knob to grow:
    'traversal' (open/m2l/p2p caps) or 'cic' (cic_tile)."""

    def __init__(self, msg: str, kind: str = "traversal", bits: int = 0):
        super().__init__(msg)
        self.kind = kind
        # for kind='traversal': OR of traversal.OVF_* telling WHICH of the
        # three caps tripped (0 = unknown -> grow all three)
        self.bits = bits


def make_force_fn(cfg: SimConfig, engine: str = "pm") -> ForceFn:
    """Build a (pos) -> (acc_short, acc_pm) function.

    engine:
      'pm'     -- PM only (the reference's PMONLY mode, photoNs.c:70-126)
      'direct' -- O(N^2) damped direct sum short-range + PM (oracle engine)
      'fmm'    -- tree FMM short-range + PM (the production TreePM engine)
    """
    dtype = jnp.dtype(cfg.dtype)
    mass = cfg.particle_mass

    if cfg.longshort or cfg.pm_only or engine == "pm":
        # PMONLY mode uses the bare 1/k^2 kernel -- conv_pmonly
        # (conv.f90:36-139): no Gaussian split filter, no CIC deconvolution.
        # gf is built IN-TRACE (green_function_traced): a captured host
        # array is inlined into the HLO as a literal -- 270 MB of program
        # text at 512^3, rejected by the axon remote compiler (HTTP 413)
        from photons_tpu.pm.solver import green_function_traced

        def pm_fn(pos):
            gf = green_function_traced(
                cfg.n_side, cfg.boxsize, cfg.split_radius,
                deconvolve=not cfg.pm_only, dtype=dtype)
            return pm_accel(pos, gf, mass=mass, boxsize=cfg.boxsize,
                            n_side=cfg.n_side,
                            gradient=cfg.pm_gradient,
                            interlace="off" if cfg.pm_only
                            else cfg.pm_interlace)
    else:
        # without the Ewald split the tree computes the FULL Newtonian
        # force; adding a PM solve would double-count gravity (and impose
        # periodicity on open-boundary runs)
        def pm_fn(pos):
            return jnp.zeros_like(pos)

    no_diag: dict = {}

    if engine == "pm":
        def force_fn(pos):
            return jnp.zeros_like(pos), pm_fn(pos), no_diag
    elif engine == "direct":
        from photons_tpu.ops.direct import direct_forces

        def force_fn(pos):
            acc = direct_forces(
                pos, mass=mass, eps=cfg.soften_scale,
                split_radius=cfg.split_radius if cfg.longshort else None,
                boxsize=cfg.boxsize if cfg.periodic else None,
                n_images=1 if cfg.periodic else 0)
            return acc, pm_fn(pos), no_diag
    elif engine.startswith("fmm"):
        from photons_tpu.ops.fmm_engine import fmm_forces, make_fmm_force_fn

        # engine may carry a P2P backend suffix: fmm, fmm-indexing,
        # fmm-redundant (the two Pallas layouts), fmm-jnp
        backend = engine.partition("-")[2] or "jnp"

        if cfg.pm_only:
            raise ValueError("pm_only config with an fmm engine")

        use_pallas_cic = cfg.longshort and (
            cfg.cic_backend == "pallas"
            or (cfg.cic_backend == "auto"
                and jax.default_backend() == "tpu"))
        if use_pallas_cic:
            # PM rides the FMM tree: Pallas CIC kernels on the Hilbert
            # leaf blocks, one shared unsort scatter (pm_from_tree).
            # The Green's function is built lazily in-trace (see pm_fn
            # above for why a captured array cannot scale past ~256^3);
            # fmm_forces accepts a () -> gf thunk for exactly this.
            from photons_tpu.pm.solver import green_function_traced
            gf_t = partial(green_function_traced, cfg.n_side, cfg.boxsize,
                           cfg.split_radius, dtype=dtype)

            if cfg.sorted_state:
                def force_fn(pos):
                    (acc, acc_pm, pos_s, perm), diag = fmm_forces(
                        pos, cfg, p2p_backend=backend, pm_gf=gf_t,
                        layout="sorted")
                    return pos_s, acc, acc_pm, perm, diag
                force_fn.sorted = True
                force_fn.pm_fused = True
                if cfg.list_reuse > 1:
                    from photons_tpu.ops.fmm_engine import fmm_forces_reuse

                    def rebuild_fn(pos):
                        (acc, acc_pm, pos_s, perm, lists), diag = fmm_forces(
                            pos, cfg, p2p_backend=backend, pm_gf=gf_t,
                            layout="sorted", return_lists=True)
                        return (pos_s, acc, acc_pm, perm, lists), diag

                    def reuse_fn(pos_s, lists, pos_ref):
                        (acc, acc_pm), diag = fmm_forces_reuse(
                            pos_s, lists, pos_ref, cfg,
                            p2p_backend=backend, pm_gf=gf_t)
                        return acc, acc_pm, diag

                    force_fn.rebuild = rebuild_fn
                    force_fn.reuse = reuse_fn
                    force_fn.reuse_k = cfg.list_reuse
                return force_fn

            def force_fn(pos):
                (acc, acc_pm), diag = fmm_forces(
                    pos, cfg, p2p_backend=backend, pm_gf=gf_t)
                return acc, acc_pm, diag
            force_fn.pm_fused = True
            return force_fn

        if cfg.sorted_state:
            def force_fn(pos):
                (acc, pos_s, perm), diag = fmm_forces(
                    pos, cfg, p2p_backend=backend, layout="sorted")
                # PM evaluated at the sorted positions == the perm-gather
                # of PM at the input positions (same particle set)
                return pos_s, acc, pm_fn(pos_s), perm, diag
            force_fn.sorted = True
            if cfg.list_reuse > 1:
                from photons_tpu.ops.fmm_engine import fmm_forces_reuse

                def rebuild_fn(pos):
                    (acc, pos_s, perm, lists), diag = fmm_forces(
                        pos, cfg, p2p_backend=backend, layout="sorted",
                        return_lists=True)
                    return (pos_s, acc, pm_fn(pos_s), perm, lists), diag

                def reuse_fn(pos_s, lists, pos_ref):
                    (acc,), diag = fmm_forces_reuse(
                        pos_s, lists, pos_ref, cfg, p2p_backend=backend)
                    return acc, pm_fn(pos_s), diag

                force_fn.rebuild = rebuild_fn
                force_fn.reuse = reuse_fn
                force_fn.reuse_k = cfg.list_reuse
            return force_fn

        fmm_fn = make_fmm_force_fn(cfg, p2p_backend=backend)

        def force_fn(pos):
            acc, diag = fmm_fn(pos)
            return acc, pm_fn(pos), diag
    else:
        raise ValueError(f"unknown force engine {engine!r}")
    return force_fn


def make_step_fn(cfg: SimConfig, force_fn: ForceFn):
    """One KDK step as a pure jitted function of (state, dk, dd, a_next).

    With ``cfg.fused_step=False`` the step is instead a sequence of
    separately-jitted device programs (kick+drift, short-range force, PM,
    closing kick): XLA then never co-schedules the FMM and PM subgraphs,
    so peak HBM is the max of the stages rather than their sum -- the
    knob that fits 256^3 on a single 16 GB v5e.
    """
    grav = cfg.grav_const
    boxsize = cfg.boxsize
    periodic = cfg.periodic

    if not cfg.fused_step or getattr(force_fn, "reuse_k", 1) > 1:
        # list reuse needs the host-driven dispatch (the cached lists live
        # between step invocations), so it always takes the split path
        return _make_step_fn_split(cfg, force_fn)

    # HBM-frugal stepping (cfg.frugal): donate the incoming state pytree.
    # The fused step is ONE program, so donation lets XLA free the dead
    # post-kick acc/acc_pm/vel buffers mid-program instead of holding all
    # of them live until the dispatch returns -- at 512^3 that is the
    # difference between a ~10 GB resident floor and a ~4 GB one (measured
    # round-4 runtime OOM).  The run loop pairs this with a HOST-side
    # rollback state: donation invalidates every alias of the old state,
    # so the elastic-recovery checkpoint cannot share device buffers.
    donate = (0,) if cfg.frugal else ()

    if getattr(force_fn, "sorted", False):
        # sorted-state stepping: the force engine returns everything in the
        # tree's space-filling-curve order plus the perm that maps sorted
        # slot -> input slot; vel/ids follow by a gather (a TPU row gather
        # is ~10x cheaper than the unsort scatter this replaces)
        @partial(jax.jit, donate_argnums=donate)
        def step(state: SimState, dk, dd, a_next):
            dkh = 0.5 * dk * grav
            vel = state.vel + (state.acc + state.acc_pm) * dkh
            pos = state.pos + vel * dd
            if periodic:
                pos = wrap_periodic(pos, boxsize)
            pos_s, acc, acc_pm, perm, diag = force_fn(pos)
            if cfg.frugal:
                # store the acc + acc_pm SUM with a (1, 3) broadcastable
                # placeholder in acc_pm: every consumer only ever reads
                # the sum (KDK kicks, sim.py:8-11), and the separate
                # (N, 3) acc_pm costs 2.15 GB of program output + state
                # at 512^3 -- the measured post-compile runtime OOM
                # margin.  The reference's part[].acc_pm split is an
                # artifact of its AoS layout, not a consumer need.
                acc = acc + acc_pm
                acc_pm = jnp.zeros((1, 3), acc.dtype)
                vel = vel[perm] + acc * dkh
            else:
                vel = vel[perm] + (acc + acc_pm) * dkh
            ids = None if state.ids is None else state.ids[perm]
            return SimState(pos=pos_s, vel=vel, acc=acc, acc_pm=acc_pm,
                            a=jnp.asarray(a_next, pos_s.dtype),
                            ids=ids), diag

        step.donates = bool(donate)
        return step

    @partial(jax.jit, donate_argnums=donate)
    def step(state: SimState, dk, dd, a_next):
        dkh = 0.5 * dk * grav
        vel = state.vel + (state.acc + state.acc_pm) * dkh
        pos = state.pos + vel * dd
        if periodic:
            pos = wrap_periodic(pos, boxsize)
        acc, acc_pm, diag = force_fn(pos)
        if cfg.frugal:        # store the sum (see the sorted-step note)
            acc = acc + acc_pm
            acc_pm = jnp.zeros((1, 3), acc.dtype)
        vel = vel + (acc + acc_pm) * dkh
        return SimState(pos=pos, vel=vel, acc=acc, acc_pm=acc_pm,
                        a=jnp.asarray(a_next, state.pos.dtype)), diag

    step.donates = bool(donate)
    return step


def _aot_wrap(jitted):
    """Call through an ahead-of-time-compiled executable.

    The axon dispatch-time compile attaches options (auto output layouts)
    under which XLA materializes a lane-padded (3N, 3) fusion output --
    24 GB at 256^3 -- while the same HLO through ``lower().compile()``
    chooses compact layouts and fits.  Shapes are static per run, so one
    AOT executable per argument signature is exact."""
    cache = {}

    def call(*args):
        key = tuple(
            (a.shape, str(a.dtype)) if hasattr(a, "shape") else type(a)
            for a in args)
        compiled = cache.get(key)
        if compiled is None:
            lowered = jitted.lower(*args)
            try:
                compiled = lowered.compile()
            except Exception:
                # leave the program text behind for layout-OOM debugging
                import tempfile
                path = os.path.join(
                    tempfile.gettempdir(),
                    f"photons_aot_fail_{abs(id(jitted)) % 99991}.mlir")
                with open(path, "w") as fh:
                    fh.write(lowered.as_text())
                raise
            cache[key] = compiled
        return compiled(*args)

    return call


def _make_step_fn_split(cfg: SimConfig, force_fn: ForceFn):
    """The fused step as four separate device programs (see make_step_fn)."""
    grav = cfg.grav_const
    boxsize = cfg.boxsize
    periodic = cfg.periodic

    @jax.jit
    def kick_drift(pos, vel, acc, acc_pm, dk, dd):
        dkh = 0.5 * dk * grav
        vel = vel + (acc + acc_pm) * dkh
        pos = pos + vel * dd
        if periodic:
            pos = wrap_periodic(pos, boxsize)
        return pos, vel

    @jax.jit
    def close_kick(vel, acc, acc_pm, dk):
        return vel + (acc + acc_pm) * (0.5 * dk * grav)

    if getattr(force_fn, "sorted", False):
        # sorted-state stepping (one force program: the sorted layout only
        # pays off when tree build, forces and PM share one executable and
        # the unsort scatter is gone entirely); vel/ids follow the new
        # sorted order by a perm gather fused into the closing kick
        forces_aot = _aot_wrap(jax.jit(force_fn))
        reuse_k = getattr(force_fn, "reuse_k", 1)
        if reuse_k > 1:
            rebuild_aot = _aot_wrap(jax.jit(force_fn.rebuild))
            reuse_aot = _aot_wrap(jax.jit(force_fn.reuse))
        # cache: interaction lists + reference positions of the last
        # rebuild.  Lives in the closure, NOT SimState: the run loop is
        # host-driven, and any rollback rebuilds the step fn (fresh cache)
        cache = {"age": 0, "lists": None, "pos_ref": None}

        @jax.jit
        def gather_close_kick(vel, ids, perm, acc, acc_pm, dk):
            vel = vel[perm] + (acc + acc_pm) * (0.5 * dk * grav)
            return vel, (None if ids is None else ids[perm])

        def step(state: SimState, dk, dd, a_next):
            pos, vel = kick_drift(state.pos, state.vel, state.acc,
                                  state.acc_pm, dk, dd)
            if (cache["lists"] is not None
                    and cache["age"] < reuse_k - 1):
                # reuse step: frozen sort (pos is still in the rebuild's
                # order), cached lists, refreshed geometry/multipoles
                acc, acc_pm, diag = reuse_aot(pos, cache["lists"],
                                              cache["pos_ref"])
                cache["age"] += 1
                vel = close_kick(vel, acc, acc_pm, dk)
                ids = state.ids
                pos_s = pos
            elif reuse_k > 1:
                (pos_s, acc, acc_pm, perm, lists), diag = rebuild_aot(pos)
                cache.update(age=0, lists=lists, pos_ref=pos_s)
                vel, ids = gather_close_kick(vel, state.ids, perm, acc,
                                             acc_pm, dk)
            else:
                pos_s, acc, acc_pm, perm, diag = forces_aot(pos)
                vel, ids = gather_close_kick(vel, state.ids, perm, acc,
                                             acc_pm, dk)
            return SimState(pos=pos_s, vel=vel, acc=acc, acc_pm=acc_pm,
                            a=jnp.asarray(a_next, jnp.dtype(cfg.dtype)),
                            ids=ids), diag

        step.forces_sorted = forces_aot
        return step

    if getattr(force_fn, "pm_fused", False):
        # Pallas-CIC PM shares the FMM tree and scatter: the force stage
        # is ONE program (the kernels are opaque to XLA, so the temp
        # co-scheduling blowup that motivated the FMM/PM split does not
        # recur); kicks stay separate programs
        forces_aot = _aot_wrap(jax.jit(force_fn))

        def step(state: SimState, dk, dd, a_next):
            pos, vel = kick_drift(state.pos, state.vel, state.acc,
                                  state.acc_pm, dk, dd)
            acc, acc_pm, diag = forces_aot(pos)
            vel = close_kick(vel, acc, acc_pm, dk)
            return SimState(pos=pos, vel=vel, acc=acc, acc_pm=acc_pm,
                            a=jnp.asarray(a_next, jnp.dtype(cfg.dtype))), \
                diag

        step.forces_all = forces_aot
        return step

    # force_fn traces both halves; jitting two restrictions of it keeps the
    # FMM and PM graphs in separate executables (DCE removes the other half)
    @jax.jit
    def short_part(pos):
        acc, _, diag = force_fn(pos)
        return acc, diag

    @jax.jit
    def pm_part(pos):
        _, acc_pm, _ = force_fn(pos)
        return acc_pm

    short_aot = _aot_wrap(short_part)
    pm_aot = _aot_wrap(pm_part)

    def step(state: SimState, dk, dd, a_next):
        pos, vel = kick_drift(state.pos, state.vel, state.acc, state.acc_pm,
                              dk, dd)
        acc, diag = short_aot(pos)
        acc_pm = pm_aot(pos)
        vel = close_kick(vel, acc, acc_pm, dk)
        return SimState(pos=pos, vel=vel, acc=acc, acc_pm=acc_pm,
                        a=jnp.asarray(a_next, jnp.dtype(cfg.dtype))), diag

    step.short_part = short_aot         # compute_forces reuses the split
    step.pm_part = pm_aot               # programs (same HBM ceiling)
    return step


@dataclasses.dataclass
class Simulation:
    """Owns config, state, the jitted step, timers and the run log."""

    cfg: SimConfig
    state: SimState
    engine: str = "pm"
    log: Optional[RunLog] = None
    timers: PhaseTimers = dataclasses.field(default_factory=PhaseTimers)
    # capacity recoveries taken so far: each one is a recompile + window
    # replay, so a well-pre-sized production config should finish with 0
    # (VERDICT r2 next-7); scripts assert on this
    recoveries: int = 0

    def __post_init__(self):
        # capacity recovery re-runs this: drop the cached initial-force
        # program (it closes over the old force fn / cap geometry)
        if hasattr(self, "_initial_fused"):
            del self._initial_fused
        self._force_fn = make_force_fn(self.cfg, self.engine)
        self._step_fn = make_step_fn(self.cfg, self._force_fn)
        # frugal sorted runs donate pos into the initial force program:
        # the sorted engine returns a fresh pos_s anyway, so the unsorted
        # input is dead the moment the program has consumed it (1.6 GB of
        # workspace headroom at 512^3).  compute_forces immediately
        # replaces state.pos with pos_s, so no alias survives.
        self._force_jit = jax.jit(
            self._force_fn,
            donate_argnums=(0,) if (self.cfg.frugal and
                                    getattr(self._force_fn, "sorted",
                                            False)) else ())
        self._block_fns = None              # built lazily (adaptive="block")
        self._block_fast = None             # sorted fused block substeps
        self._ladder_cache = {}             # one-jit macro ladders, by nf

    # -- construction -----------------------------------------------------
    @classmethod
    def from_arrays(cls, cfg: SimConfig, pos, vel, engine: str = "pm",
                    a: Optional[float] = None, log: bool = False):
        dtype = jnp.dtype(cfg.dtype)
        state = make_state(pos, vel, a if a is not None
                           else cfg.initial_scale_factor, dtype,
                           with_ids=cfg.sorted_state, defer_acc=True)
        run_log = RunLog(cfg.output_path, cfg.code_proj) if log else None
        return cls(cfg=cfg, state=state, engine=engine, log=run_log)

    @classmethod
    def from_config(cls, cfg: SimConfig, engine: str = "pm", log: bool = False):
        """Reference entry path: read the IC named by the parameter file
        (SnapFormat 2 -> Gadget-2, 0 -> whitespace text, -2 -> uniform
        random; initial.c:355-460)."""
        if cfg.snap_format == -2:
            from photons_tpu.ics import ic_uniform
            pos, vel = ic_uniform(cfg)
            a0 = cfg.initial_scale_factor
        elif cfg.snap_format == 0:
            # text snapshots carry no header: geometry/cosmology stay as
            # configured, velocities verbatim (initial.c:380-386 requires
            # SnapNumber == 1 -- a single file)
            from photons_tpu.io.gadget import read_particle_text
            if cfg.snap_number != 1:
                raise ValueError("SnapFormat 0 supports a single file only "
                                 "(SnapNumber == 1; initial.c:380-386)")
            pos, vel = read_particle_text(cfg.input_path)
            cfg = cfg.replace(n_part_total=pos.shape[0])
            a0 = cfg.initial_scale_factor
        else:
            from photons_tpu.io.gadget import read_gadget, read_gadget_header
            head = read_gadget_header(cfg.input_path)
            cfg = cfg.replace(
                boxsize=head.boxsize, omega_m=head.omega_m,
                omega_x=head.omega_x, hubble=head.hubble,
                initial_redshift=head.redshift,
                n_part_total=head.n_total,
                mass_part=head.mass[1])
            _, pos, vel = read_gadget(cfg.input_path, cfg.snap_number)
            a0 = 1.0 / (1.0 + head.redshift)
        return cls.from_arrays(cfg, pos, vel, engine=engine, a=a0, log=log)

    # -- running -----------------------------------------------------------
    last_diag: dict = dataclasses.field(default_factory=dict)

    def compute_forces(self):
        if getattr(self._force_fn, "sorted", False):
            if self.cfg.frugal:
                # ONE donated program for the whole initial sorted force
                # INCLUDING the vel/ids perm gathers: the staged
                # choreography (force program, then host-level gathers)
                # OOMed at 512^3 even with every dead buffer dropped --
                # the force program's outputs leave the 16 GB heap too
                # fragmented for a fresh (N, 3) gather allocation.  One
                # program lets XLA place the gathers inside the same
                # arena it just used (measured round-5; the steady-state
                # step is already one fused program for the same reason).
                if not hasattr(self, "_initial_fused"):
                    fjit = self._force_fn

                    def initial(pos, vel, ids):
                        pos_s, acc, acc_pm, perm, diag = fjit(pos)
                        # frugal: collapse acc_pm into acc (see the
                        # frugal note in _make_step_fn -- consumers only
                        # read the sum; the separate output is 2.15 GB
                        # at 512^3, the runtime OOM margin)
                        acc = acc + acc_pm
                        acc_pm = jnp.zeros((1, 3), acc.dtype)
                        vel_s = vel[perm]
                        ids_s = None if ids is None else ids[perm]
                        return pos_s, acc, acc_pm, vel_s, ids_s, diag
                    self._initial_fused = jax.jit(
                        initial, donate_argnums=(0, 1, 2))
                st = self.state
                pos_s, acc, acc_pm, vel_s, ids_s, diag = \
                    self._initial_fused(st.pos, st.vel, st.ids)
                self.state = SimState(pos=pos_s, vel=vel_s, acc=acc,
                                      acc_pm=acc_pm, a=st.a, ids=ids_s)
                self._check_diag(diag)
                return
            # sorted-state: the initial force call also reorders the whole
            # state into the tree's space-filling-curve order
            forces = getattr(self._step_fn, "forces_sorted", None) \
                or self._force_jit
            pos_s, acc, acc_pm, perm, diag = forces(self.state.pos)
            old_vel, old_ids = self.state.vel, self.state.ids
            # drop the dead pre-sort pos/acc/acc_pm buffers BEFORE the
            # gathers: at 512^3 the state plus its sorted copy is ~12 GB
            # and the gather workspace tipped HBM (measured runtime OOM).
            # vel gets a broadcastable (1, 3) placeholder so the state is
            # never shape-corrupt; if a gather fails (the very OOM this
            # choreography guards against) the old vel/ids are restored
            # (note _gather_rows donates ITS input, so on success the
            # pre-sort buffers are gone -- callers must not hold them).
            self.state = dataclasses.replace(
                self.state, pos=pos_s, acc=acc, acc_pm=acc_pm,
                vel=jnp.zeros((1, pos_s.shape[-1]), pos_s.dtype), ids=None)
            try:
                vel = _gather_rows(old_vel, perm)
                ids = None if old_ids is None else _gather_rows(old_ids,
                                                                perm)
            except Exception:
                self.state = dataclasses.replace(self.state, vel=old_vel,
                                                 ids=old_ids)
                raise
            del old_vel, old_ids
            self.state = dataclasses.replace(self.state, vel=vel, ids=ids)
            self._check_diag(diag)
            return
        forces_all = getattr(self._step_fn, "forces_all", None)
        short_part = getattr(self._step_fn, "short_part", None)
        if forces_all is not None:      # split mode, tree-shared Pallas PM
            acc, acc_pm, diag = forces_all(self.state.pos)
        elif short_part is not None:    # split-dispatch mode (fused_step=False)
            acc, diag = short_part(self.state.pos)
            acc_pm = self._step_fn.pm_part(self.state.pos)
        else:
            acc, acc_pm, diag = self._force_jit(self.state.pos)
        self.state = dataclasses.replace(self.state, acc=acc, acc_pm=acc_pm)
        self._check_diag(diag)

    def _check_diag(self, diag):
        if diag:
            self.last_diag = {k: (int(v) if hasattr(v, "item") else v)
                              for k, v in diag.items()}
            if self.last_diag.get("cic_overflow"):
                raise CapacityOverflowError(
                    "CIC straddler overflow -- more leaves exceed the "
                    "cic_tile brick than the cic_straddler_cap XLA residual "
                    "path absorbs; enlarge cic_straddler_cap (SFC "
                    "straddlers) or cic_tile (genuinely wide leaves)",
                    kind="cic")
            if self.last_diag.get("skin_overflow"):
                raise CapacityOverflowError(
                    "Verlet-skin overflow -- a particle drifted more than "
                    "verlet_skin*cutoff/2 since the last list rebuild; "
                    "enlarge verlet_skin or lower list_reuse",
                    kind="skin")
            if self.last_diag.get("overflow"):
                raise CapacityOverflowError(
                    "traversal capacity overflow -- enlarge "
                    "open_cap_per_node / m2l_cap_per_node / p2p_neighbor_cap "
                    "(SURVEY.md section 7, 'static shapes for an adaptive "
                    "structure')",
                    bits=int(self.last_diag.get("overflow_bits", 0)))

    def _grow_capacities(self, factor: float = 1.5, kind: str = "traversal",
                         bits: int = 0):
        """Elastic recovery: grow the static capacity knobs and recompile
        (the 'recompile when capacities overflow' policy, SURVEY.md 7;
        the reference instead aborts or silently truncates).

        Growth is GENTLE (x1.5 rounded to the 32-lane granule): a x2 jump
        not only risks HBM (the per-level M2L tables widen into multi-GB
        multipole intermediates) but permanently degrades every subsequent
        step -- the traversal's candidate width is 2x the open cap, so a
        96 -> 192 doubling was measured to add ~1.5 s/step of frontier
        gather/sort work at 256^3 for a ~10% count overshoot.

        kind='cic' means more leaves straddle the brick tile than the
        cic_straddler_cap XLA residual path absorbs.  Growing the tile
        cannot fix SFC straddlers (their footprint exceeds ANY practical
        tile -- fmm_engine.pm_from_tree), so recovery preferentially
        doubles cic_straddler_cap; the tile additionally grows (+8 cells)
        while the paint/read kernels' VMEM scratch still fits the ~16 MB
        scoped budget, which shrinks the straddler set when leaves are
        merely wide rather than curve-straddling.  If the tile is already
        VMEM-capped AND the straddler cap has reached the leaf count, the
        run switches cic_backend to 'xla' (slower PM, correct forces)
        instead of dying in the compiler.  kind='skin' doubles the Verlet
        skin (particles drifted out of the list-reuse margin before the
        scheduled rebuild)."""
        self.recoveries += 1
        print(f"photoNs-TPU: capacity recovery kind={kind} "
              f"(open={self.cfg.open_cap_per_node} "
              f"m2l={self.cfg.m2l_cap_per_node} "
              f"p2p={self.cfg.p2p_neighbor_cap} "
              f"cic_tile={self.cfg.cic_tile}) -> growing",
              file=sys.stderr, flush=True)
        if kind == "cic":
            # straddler cap first: it is the knob the overflow condition
            # actually tests (n_straddlers > cap), and SFC straddlers are
            # immune to tile growth (ADVICE round 2)
            cap_new = max(8, self.cfg.cic_straddler_cap * 2)
            t_new = self.cfg.cic_tile + 8
            # read kernel scratch: (2, t, t, tz) f32 double-buffered
            # bricks plus ~3x t*t*tz of weight/contraction temps
            from photons_tpu.pm.cic_pallas import _z_tile
            tz = _z_tile(self.cfg.n_side)
            scoped = (2 + 3) * t_new * t_new * tz * 4
            tile_capped = scoped > 12 * 1024 * 1024
            # past 512 residual leaves the XLA scatter dominates the paint
            # anyway -- switch the whole backend rather than keep a Pallas
            # kernel that no longer carries the mass
            if tile_capped and cap_new > 512:
                self.cfg = self.cfg.replace(cic_backend="xla")
            else:
                self.cfg = self.cfg.replace(
                    cic_straddler_cap=cap_new,
                    cic_tile=self.cfg.cic_tile if tile_capped else t_new)
        elif kind == "skin":
            self.cfg = self.cfg.replace(
                verlet_skin=self.cfg.verlet_skin * 2.0)
        else:
            # grow ONLY the caps the traversal's overflow_bits name
            # (NEXT.md round-3 lead): the frontier's candidate width is
            # 2x open_cap, so growing untripped caps permanently taxes
            # every later step's gather/sort volume.  bits == 0 (older
            # diag paths / sharded reductions) falls back to all three.
            from photons_tpu.ops.traversal import OVF_M2L, OVF_OPEN, OVF_P2P

            def up(v):
                return -(-int(v * factor) // 32) * 32
            grow_all = bits == 0
            grow_open = grow_all or bits & OVF_OPEN
            levels = self.cfg.open_cap_levels
            # bounded-memory fallback (LEN_TASK flushing as production
            # policy, 2_Redundant/src/fmm.c:921,377-418): once the p2p
            # table would outgrow p2p_cap_budget, further OVF_P2P
            # recoveries ADD a segmented pass over the cached candidate
            # rows instead of growing the cap -- extreme clustering then
            # runs at fixed memory where cap growth would OOM HBM
            grow_p2p = grow_all or bits & OVF_P2P
            p2p_new, passes_new = self.cfg.p2p_neighbor_cap, \
                self.cfg.p2p_passes
            if grow_p2p:
                cand = up(self.cfg.p2p_neighbor_cap)
                if cand <= self.cfg.p2p_cap_budget:
                    p2p_new = cand
                elif self.cfg.p2p_neighbor_cap < self.cfg.p2p_cap_budget:
                    # last growth step lands exactly on the budget
                    p2p_new = (self.cfg.p2p_cap_budget // 32) * 32
                else:
                    passes_new += 1
                    print(f"photoNs-TPU: p2p cap at budget "
                          f"({self.cfg.p2p_neighbor_cap} <= "
                          f"{self.cfg.p2p_cap_budget}); switching to "
                          f"segmented multi-pass (p2p_passes="
                          f"{passes_new})", file=sys.stderr, flush=True)
                    if self.log is not None:
                        self.log.note(
                            f"capacity recovery: segmented near-field "
                            f"multi-pass engaged (p2p_passes={passes_new} "
                            f"at cap {p2p_new})")
            self.cfg = self.cfg.replace(
                p2p_passes=passes_new,
                # a per-level schedule grows as a whole: the overflow bit
                # does not say WHICH level tripped, and the schedule's
                # relative taper is geometric, so scaling every entry
                # keeps it valid while guaranteeing the recovery loop
                # terminates
                open_cap_levels=tuple(up(v) for v in levels)
                if grow_open and levels is not None else levels,
                open_cap_per_node=up(self.cfg.open_cap_per_node)
                if grow_open
                else self.cfg.open_cap_per_node,
                m2l_cap_per_node=up(self.cfg.m2l_cap_per_node)
                if grow_all or bits & OVF_M2L
                else self.cfg.m2l_cap_per_node,
                p2p_neighbor_cap=p2p_new)
        self.__post_init__()

    def run(self, n_steps: Optional[int] = None,
            a_final: Optional[float] = None,
            snapshot_times: Optional[Tuple[float, ...]] = None,
            callback=None, adaptive: bool = False, eta: float = 0.025,
            max_level: int = 6, check_interval: int = 8,
            profile_interval: Optional[int] = None,
            fence_interval: Optional[int] = None):
        """Run the KDK loop from the current scale factor.

        adaptive: refine each macro step into 2^k KDK substeps chosen from
        the acceleration criterion dt <= eta*sqrt(eps/|a|_max) (the
        reference declares this capability but ships no implementation --
        inc/adaptive.h:12-20, adaptive_level_maximum logged but never set,
        photoNs.h:39).

        profile_interval: every k-th sync, additionally run the
        phase-decomposed force pipeline (photons_tpu.profiling) so the run
        log carries the reference's real phase-timer taxonomy
        (utility.c:8-48).  Defaults to one profile per check window when a
        run log is attached, else off.

        fence_interval: completion-fence every k-th step inside a check
        window and spread each fenced span's wall time evenly over its
        rows.  1 reproduces the reference's true per-step rows
        (photoNs.c:320-333) but costs one dispatch-pipeline drain per step
        -- ~1.5 s/step through the axon tunnel at 256^3 (VERDICT r2
        weak-8).  None (default) fences only at syncs, so rows carry the
        check-window average and the step loop keeps full dispatch
        overlap.
        """
        cfg = self.cfg
        n_steps = n_steps if n_steps is not None else cfg.n_steps
        a_final = a_final if a_final is not None else cfg.final_scale_factor
        a0 = float(self.state.a)
        if cfg.newtonian:
            # static Newtonian stepping: (a0, a_final) are internal TIME
            # bounds, dk = dd = dt (the KDK step is already pure in
            # (dk, dd); only the grid derivation is cosmological)
            if adaptive and adaptive != "block":
                raise ValueError("global adaptive stepping is only "
                                 "implemented for cosmological (log-a) "
                                 "integration; use adaptive='block'")
            dt = (a_final - a0) / n_steps
            dk = dd = np.full(n_steps, dt)
            a_grid = a0 + dt * np.arange(n_steps + 1)
            # block macro bounds are TIME for newtonian configs (the
            # macro-step fns branch on cfg.newtonian)
            loga = a_grid
        else:
            dk, dd = cosmology.step_factors(a0, a_final, n_steps,
                                            cfg.omega_m, cfg.omega_x)
            loga = np.log(a0) + (np.log(a_final) - np.log(a0)) / n_steps \
                * np.arange(n_steps + 1)
            a_grid = np.exp(loga)

        snap_left = sorted(snapshot_times or ())

        max_retries = 6
        retries = 0
        while True:
            try:
                # 'warmup', NOT 'fmm': this first force computation includes
                # compilation, and recording it under a phase name let a
                # stale compile-inclusive value (fmm=73.59 s) survive into
                # every row of the round-2 256^3 production log whenever the
                # in-loop profiler later died (VERDICT r2 weak-3)
                with self.timers.measure("warmup"):
                    self.compute_forces()
                    jax.block_until_ready(self.state.acc)
                break
            except CapacityOverflowError as e:
                retries += 1
                if retries > max_retries:
                    raise
                self._grow_capacities(kind=e.kind, bits=e.bits)

        if profile_interval is None and self.log is not None:
            profile_interval = 1            # one phase profile per window
        profiler = None
        if profile_interval:
            from photons_tpu.profiling import PhaseProfiler
            profiler = PhaseProfiler(self.cfg, self.engine)
            # compile + run all phases once NOW so no in-loop profile ever
            # records compilation (stale compile-inclusive rows, VERDICT r1)
            try:
                profiler.warm(self.state.pos)
            except Exception as exc:
                # the phase pipeline is telemetry: at the largest N its
                # standalone stage programs can exceed HBM alongside the
                # resident state -- degrade to unprofiled rows, VISIBLY,
                # rather than kill the run at warmup
                profiler = None
                msg = (f"phase profiler warmup failed "
                       f"({type(exc).__name__}); phase columns disabled")
                print(f"photoNs-TPU: WARNING: {msg}",
                      file=sys.stderr, flush=True)
                if self.log is not None:
                    self.log.note(f"WARNING: {msg}")

        self.max_adaptive_level = 0
        self.last_level_max = 0          # level of the CURRENT macro step
        # rollback point for elastic capacity recovery: results between
        # verified syncs are invalid if an overflow is detected
        # Frugal runs hold the rollback point as HOST copies: the donated
        # step invalidates every device alias of the pre-step state, and a
        # second resident device copy (~7 GB at 512^3) is exactly the HBM
        # the donation frees.  One device_get per sync window is the cost.
        _keep = ((lambda s: jax.device_get(s)) if cfg.frugal
                 else (lambda s: s))
        _restore = ((lambda s: jax.device_put(s)) if cfg.frugal
                    else (lambda s: s))
        verified_state, verified_i = _keep(self.state), 0
        pending_ovf = {}
        pending_rows = []        # buffered log rows, flushed at each sync
        window_t0 = time.perf_counter()
        windows_done = 0
        # row timing granularity: completion fences drain the dispatch
        # pipeline (~1.5 s through the axon tunnel at 256^3), so per-step
        # fencing taxed production runs ~18% (VERDICT r2 weak-8).  Rows now
        # carry the average of their fence span: every fence_interval steps
        # when set, else only the sync fence (check_interval span).
        span_start = 0           # pending_rows index where the open span began
        span_t0 = window_t0
        profile_failures = 0
        if self.log is not None:
            self.log.note(
                f"row step_time granularity: {fence_interval or check_interval}"
                f"-step fence spans (fence_interval="
                f"{fence_interval}, check_interval={check_interval})")

        def _close_span(end_time):
            nonlocal span_start, span_t0
            span = pending_rows[span_start:]
            if span:
                avg = (end_time - span_t0) / len(span)
                for r in span:
                    r[2] = avg
            span_start = len(pending_rows)
            span_t0 = end_time

        i = 0
        while i < n_steps:
            if adaptive == "block":
                self.state, diag = self._block_macro_step(
                    float(loga[i]), float(loga[i + 1]), eta, max_level)
            elif adaptive:
                level = self._adaptive_level(float(dk[i]), eta, max_level)
                self.last_level_max = level
                self.max_adaptive_level = max(self.max_adaptive_level, level)
                n_sub = 1 << level
                sub_loga = np.linspace(loga[i], loga[i + 1], n_sub + 1)
                diag = {}
                for j in range(n_sub):
                    dkj = cosmology.kick_factor(sub_loga[j], sub_loga[j + 1],
                                                cfg.omega_m, cfg.omega_x)
                    ddj = cosmology.drift_factor(sub_loga[j], sub_loga[j + 1],
                                                 cfg.omega_m, cfg.omega_x)
                    self.state, dsub = self._step_fn(
                        self.state, float(dkj), float(ddj),
                        float(np.exp(sub_loga[j + 1])))
                    dsub = dict(dsub)
                    for key in ("overflow", "overflow_bits",
                                "cic_overflow", "skin_overflow"):
                        if key in dsub and key in diag:
                            dsub[key] = dsub[key] | diag[key]
                    diag = dsub
            else:
                self.state, diag = self._step_fn(
                    self.state, float(dk[i]), float(dd[i]),
                    float(a_grid[i + 1]))
            a_now = float(a_grid[i + 1])
            # accumulate the overflow flags ON DEVICE across the whole
            # check window (a transient overflow in any step invalidates
            # the window, not just the last step's)
            if "overflow" in diag or "cic_overflow" in diag:
                diag = dict(diag)
                for key in ("overflow", "overflow_bits",
                            "cic_overflow", "skin_overflow"):
                    if key in diag:
                        diag[key] = diag[key] | pending_ovf.get(
                            key, 0 if key == "overflow_bits" else False)
                        pending_ovf[key] = diag[key]
            # device->host syncs cost ~70 ms each through the axon tunnel:
            # only materialize diagnostics every check_interval steps, on
            # the last step, and before any snapshot is written (snapshots
            # must never be taken from an unverified state)
            # one row per step (photoNs.c:318); counters/timers only refresh
            # at syncs, so rows are buffered and flushed; each row carries a
            # real per-step wall-clock when fencing is on, else the honest
            # window average (axon dispatch returns instantly, so unfenced
            # per-step time.perf_counter deltas measure nothing)
            pending_rows.append([i, a_now, None,
                                 getattr(self, "last_level_max", 0)])

            snap_due = bool(snap_left) and a_now >= snap_left[0] - 1e-12
            sync = (i % check_interval == check_interval - 1
                    or i == n_steps - 1 or snap_due)
            if (not sync and fence_interval
                    and len(pending_rows) - span_start >= fence_interval):
                # mid-window completion fence: host-read one element, then
                # spread the span's wall time over its rows
                float(self.state.pos[0, 0])
                _close_span(time.perf_counter())
            if sync:
                try:
                    # real completion fence: host-read one element (axon's
                    # block_until_ready can return before remote execution
                    # finishes; a data-dependent read cannot)
                    float(self.state.pos[0, 0])
                    _close_span(time.perf_counter())
                    self._check_diag(diag)
                    verified_state, verified_i = _keep(self.state), i + 1
                    pending_ovf = {}
                except CapacityOverflowError as e:
                    retries += 1
                    if retries > max_retries:
                        raise
                    # grow, recompile, roll back, replay (snap_left was not
                    # popped, so due snapshots re-emit from the replay; the
                    # invalid window's buffered log rows are discarded and
                    # re-emitted by the replay)
                    self._grow_capacities(kind=e.kind, bits=e.bits)
                    self.state = _restore(verified_state)
                    pending_ovf = {}
                    i = verified_i
                    pending_rows = []
                    span_start = 0
                    window_t0 = span_t0 = time.perf_counter()
                    if self.log is not None:
                        self.log.note(
                            f"capacity recovery (kind={e.kind}): rolled "
                            f"back to step {verified_i}, window replayed")
                    continue

                window_wall = time.perf_counter() - window_t0
                step_avg = window_wall / max(1, len(pending_rows))
                for _, _, rdt, _lv in pending_rows:
                    self.timers.add("step",
                                    rdt if rdt is not None else step_avg)
                profiled_window = False
                if (profiler is not None
                        and windows_done % profile_interval == 0):
                    try:
                        profiler.profile(self.state.pos, self.timers)
                        profile_failures = 0
                        profiled_window = True
                    except Exception as exc:
                        # the phase pipeline's transients alongside the
                        # resident fused step can exceed HBM at the
                        # largest N depending on allocator state; a failed
                        # profile must degrade telemetry, never kill a
                        # production run -- but the degradation has to be
                        # VISIBLE in the log (round-2's silent disable left
                        # stale phase columns in every production row,
                        # VERDICT r2 weak-3), and transient allocator
                        # pressure deserves a retry at the next window
                        profile_failures += 1
                        msg = (f"phase profile failed at step {i} "
                               f"({type(exc).__name__}); phase columns "
                               f"are stale from the last successful "
                               f"profile")
                        print(f"photoNs-TPU: WARNING: {msg}",
                              file=sys.stderr, flush=True)
                        if self.log is not None:
                            self.log.note(f"WARNING: {msg}")
                        if profile_failures >= 3:
                            profiler = None
                            if self.log is not None:
                                self.log.note(
                                    "WARNING: phase profiler disabled "
                                    "after 3 consecutive failures")
                windows_done += 1
                if self.log is not None:
                    phases = self.timers.latest()
                    for ri, ra, rdt, rlvl in pending_rows:
                        self.log.log_step(
                            ri, ra,
                            {**phases,
                             "step": rdt if rdt is not None else step_avg},
                            n_p2p=self.last_diag.get("n_p2p", 0),
                            n_m2l=self.last_diag.get("n_m2l", 0),
                            level=rlvl, profiled=profiled_window)
                pending_rows = []

            while snap_left and a_now >= snap_left[0] - 1e-12:
                self.write_snapshot(snap_left.pop(0))
            if callback is not None:
                callback(i, self)
            if sync:
                # snapshot/callback time between the sync fence and here is
                # deliberately excluded from both window and span timing
                window_t0 = span_t0 = time.perf_counter()
                span_start = 0
                pending_rows = []
            i += 1
        return self.state

    # -- per-particle block timesteps (inc/adaptive.h surface) ---------------
    def _build_block_fns(self):
        """Jitted pieces of the block-KDK substep (kdk_level/active_particle,
        inc/adaptive.h:12-20 -- declared but never implemented in the
        reference).  Each particle carries a level l; its KDK block spans
        2^(L-l) fine steps.  A fine boundary's opening and closing sets
        coincide, so one gated force evaluation serves both; particles not
        at a boundary receive dkh = 0, making the vectorized kick a no-op
        for them (no masks in the integrator itself)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        grav = cfg.grav_const
        if not self.engine.startswith("fmm"):
            raise ValueError("block timestepping requires an fmm engine")
        from photons_tpu.ops.fmm_engine import fmm_forces
        backend = self.engine.partition("-")[2] or "jnp"

        if cfg.longshort:
            from photons_tpu.pm.solver import green_function_traced
            pm = jax.jit(lambda pos: pm_accel(
                pos, green_function_traced(cfg.n_side, cfg.boxsize,
                                           cfg.split_radius, dtype=dtype),
                mass=cfg.particle_mass, boxsize=cfg.boxsize,
                n_side=cfg.n_side, interlace=cfg.pm_interlace))
        else:
            pm = jax.jit(jnp.zeros_like)

        @jax.jit
        def short(pos, active):
            return fmm_forces(pos, cfg, p2p_backend=backend, active=active)

        @jax.jit
        def kick(vel, acc, acc_pm, levels, dkh_arr):
            dkh = dkh_arr[levels] * grav
            return vel + (acc + acc_pm) * dkh[:, None]

        @jax.jit
        def drift(pos, vel, dd):
            pos = pos + vel * dd
            return wrap_periodic(pos, cfg.boxsize) if cfg.periodic else pos

        @jax.jit
        def levels_of(acc, acc_pm, tau, eta, max_level):
            amag = jnp.sqrt(jnp.sum((acc + acc_pm) ** 2, axis=-1))
            dt_req = eta * jnp.sqrt(
                cfg.soften_scale / (jnp.maximum(amag, 1e-30) * grav))
            lv = jnp.ceil(jnp.log2(jnp.maximum(tau / dt_req, 1.0)))
            return jnp.clip(lv, 0, max_level).astype(jnp.int32)

        self._block_fns = (short, pm, kick, drift, levels_of)

    def _build_block_fns_sorted(self):
        """Production-speed block substeps (VERDICT r3 next-3).

        The round-3 block path drove the UNSORTED engine plus the XLA PM
        per substep, so each substep cost ~3x the optimized fixed step and
        refinement could only multiply wall-clock (the abandoned adaptive
        production run: 75 -> 282 s/step vs 10.8 fixed).  This path reuses
        the sorted fused machinery of the fixed step -- Pallas-CIC PM on
        the shared tree, no unsort scatter -- plus Verlet-list reuse
        WITHIN the macro step: substep 0 rebuilds tree+lists with the
        skin-inflated cutoff, later substeps refresh only geometry and
        multipoles (tree_from_sorted) and gate kernel rows by the closing
        set, and PM runs once on the macro close.  Requires an fmm engine
        with cfg.sorted_state and TreePM (longshort) + Pallas CIC; other
        configs keep the generic (slow) path.
        Returns None if the config does not qualify."""
        cfg = self.cfg
        if not (self.engine.startswith("fmm") and cfg.sorted_state):
            return None
        has_pm = cfg.longshort
        use_pallas_cic = (cfg.cic_backend == "pallas"
                          or (cfg.cic_backend == "auto"
                              and jax.default_backend() == "tpu"))
        if has_pm and not use_pallas_cic:
            return None
        from photons_tpu.ops.fmm_engine import fmm_forces, fmm_forces_reuse
        backend = self.engine.partition("-")[2] or "jnp"
        dtype = jnp.dtype(cfg.dtype)
        grav = cfg.grav_const
        if has_pm:
            from photons_tpu.pm.solver import green_function_traced
            gf_t = partial(green_function_traced, cfg.n_side, cfg.boxsize,
                           cfg.split_radius, dtype=dtype)
        else:
            # open-boundary Newtonian family (the packaged merger,
            # models/merger.py): pure tree forces, no PM phase
            gf_t = None
        # skin-inflated traversal cutoff so the macro-open lists stay
        # valid supersets across every substep (fmm_forces only inflates
        # when list_reuse > 1)
        cfgb = cfg.replace(list_reuse=max(cfg.list_reuse, 2))

        def _rebuild(pos, active, with_pm):
            out, diag = fmm_forces(
                pos, cfgb, p2p_backend=backend, active=active,
                pm_gf=gf_t if (with_pm and has_pm) else None,
                layout="sorted", return_lists=True)
            return out, diag

        rebuild_pm = _aot_wrap(jax.jit(
            lambda pos, act: _rebuild(pos, act, True)))
        rebuild_plain = _aot_wrap(jax.jit(
            lambda pos, act: _rebuild(pos, act, False)))
        reuse_pm = _aot_wrap(jax.jit(
            lambda ps, lists, ref, act: fmm_forces_reuse(
                ps, lists, ref, cfgb, p2p_backend=backend, pm_gf=gf_t,
                active=act)))
        reuse_plain = _aot_wrap(jax.jit(
            lambda ps, lists, ref, act: fmm_forces_reuse(
                ps, lists, ref, cfgb, p2p_backend=backend, active=act)))

        @jax.jit
        def gated_kick_drift(pos, vel, acc, acc_pm, levels, dkh_arr, dd):
            dkh = (dkh_arr[levels] * grav)[:, None]
            vel = vel + (acc + acc_pm) * dkh
            pos = pos + vel * dd
            if cfg.periodic:
                pos = wrap_periodic(pos, cfg.boxsize)
            return pos, vel

        @jax.jit
        def gated_close(vel, acc, acc_pm, levels, dkh_arr):
            return vel + (acc + acc_pm) * (dkh_arr[levels] * grav)[:, None]

        @jax.jit
        def permute_cols(perm, vel, levels, acc, acc_pm, ids):
            # frugal states carry a (1, 3) broadcast placeholder in
            # acc_pm -- permuting it would gather garbage rows
            pm = acc_pm if acc_pm.shape[0] == 1 else acc_pm[perm]
            return (vel[perm], levels[perm], acc[perm], pm,
                    None if ids is None else ids[perm])

        @jax.jit
        def apply_active(acc_old, acc_new, active):
            return jnp.where(active[:, None], acc_new, acc_old)

        @jax.jit
        def levels_of(acc, acc_pm, tau, eta, max_level):
            amag = jnp.sqrt(jnp.sum((acc + acc_pm) ** 2, axis=-1))
            dt_req = eta * jnp.sqrt(
                cfg.soften_scale / (jnp.maximum(amag, 1e-30) * grav))
            lv = jnp.ceil(jnp.log2(jnp.maximum(tau / dt_req, 1.0)))
            return jnp.clip(lv, 0, max_level).astype(jnp.int32)

        def make_ladder(nf: int, max_level: int, has_ids: bool):
            """ONE-JIT substep ladder (VERDICT r3 next-5 / BENCH_NOTES
            lead): the whole 2^k-substep macro as a single device
            program.  The round-4 host loop dispatched kick/force/close
            separately per substep, costing ~1 s/substep through the
            axon tunnel even at level 0 (10.6 s/macro at 64^3 where the
            fused fixed step is 0.93 s).  Freezing nf per macro (the
            level census is read once, on the macro open) lets substep 0
            (rebuild + permute), the middle reuse substeps (lax.fori_loop)
            and the PM-closing final substep compile into one executable
            -- one dispatch per macro, one compile per distinct nf.

            Gating stays per-particle exactly as the reference's
            active_particle/kdk_level surface (inc/adaptive.h:12-20):
            non-closing particles receive dkh = 0 and keep stale acc."""
            blocks = [1 << max((nf.bit_length() - 1) - l, 0)
                      for l in range(max_level + 1)]
            closing = jnp.asarray(np.array(
                [[(j + 1) % b == 0 for b in blocks] for j in range(nf)]))

            def _kick_drift(pos, vel, acc, acc_pm, levels, dkh_row, dd_j):
                dkh = (dkh_row[levels] * grav)[:, None]
                vel = vel + (acc + acc_pm) * dkh
                pos = pos + vel * dd_j
                if cfg.periodic:
                    pos = wrap_periodic(pos, cfg.boxsize)
                return pos, vel

            def _close(vel, acc, acc_pm, levels, dkh_row):
                return vel + (acc + acc_pm) * (dkh_row[levels] * grav)[:, None]

            def _flags(d):
                z = jnp.zeros((), jnp.int32)
                return (jnp.asarray(d.get("overflow", False), jnp.bool_),
                        jnp.asarray(d.get("overflow_bits", z), jnp.int32),
                        jnp.asarray(d.get("cic_overflow", False), jnp.bool_),
                        jnp.asarray(d.get("skin_overflow", False), jnp.bool_))

            def ladder(pos, vel, acc, acc_pm, levels, ids,
                       dkh_open, dkh_close, dd):
                # --- substep 0: rebuild (re-sorts; lists cached) --------
                pos, vel = _kick_drift(pos, vel, acc, acc_pm, levels,
                                       dkh_open[0], dd[0])
                active = closing[0][levels]
                if nf == 1 and has_pm:
                    (acc_new, acc_pm_new, pos_s, perm, lists), dsub = \
                        _rebuild(pos, active, True)
                else:
                    (acc_new, pos_s, perm, lists), dsub = \
                        _rebuild(pos, active, False)
                vel, acc, acc_pm, levels = (
                    vel[perm], acc[perm],
                    acc_pm if acc_pm.shape[0] == 1 else acc_pm[perm],
                    levels[perm])
                ids = ids[perm] if has_ids else ids
                pos = pos_ref = pos_s
                active = closing[0][levels]
                acc = jnp.where(active[:, None], acc_new, acc)
                if nf == 1 and has_pm:
                    acc_pm = acc_pm_new
                vel = _close(vel, acc, acc_pm, levels, dkh_close[0])
                ovf = _flags(dsub)

                if nf > 1:
                    def body(j, carry):
                        pos, vel, acc, acc_pm, ovf = carry
                        pos, vel = _kick_drift(pos, vel, acc, acc_pm,
                                               levels, dkh_open[j], dd[j])
                        act = closing[j][levels]
                        (acc_new,), d = fmm_forces_reuse(
                            pos, lists, pos_ref, cfgb,
                            p2p_backend=backend, active=act)
                        acc = jnp.where(act[:, None], acc_new, acc)
                        vel = _close(vel, acc, acc_pm, levels, dkh_close[j])
                        f = _flags(d)
                        ovf = tuple(a | b for a, b in zip(ovf, f))
                        return pos, vel, acc, acc_pm, ovf

                    pos, vel, acc, acc_pm, ovf = jax.lax.fori_loop(
                        1, nf - 1, body, (pos, vel, acc, acc_pm, ovf))
                    # --- final substep: every particle closes, PM fires --
                    j = nf - 1
                    pos, vel = _kick_drift(pos, vel, acc, acc_pm, levels,
                                           dkh_open[j], dd[j])
                    act = closing[j][levels]
                    if has_pm:
                        (acc_new, acc_pm_new), dsub = fmm_forces_reuse(
                            pos, lists, pos_ref, cfgb, p2p_backend=backend,
                            pm_gf=gf_t, active=act)
                        acc_pm = acc_pm_new
                    else:
                        (acc_new,), dsub = fmm_forces_reuse(
                            pos, lists, pos_ref, cfgb, p2p_backend=backend,
                            active=act)
                    acc = jnp.where(act[:, None], acc_new, acc)
                    vel = _close(vel, acc, acc_pm, levels, dkh_close[j])
                    ovf = tuple(a | b for a, b in zip(ovf, _flags(dsub)))
                diag = dict(dsub)
                diag["overflow"], diag["overflow_bits"], \
                    diag["cic_overflow"], diag["skin_overflow"] = ovf
                return pos, vel, acc, acc_pm, levels, ids, diag

            return _aot_wrap(jax.jit(ladder))

        return dict(rebuild_pm=rebuild_pm, rebuild_plain=rebuild_plain,
                    reuse_pm=reuse_pm, reuse_plain=reuse_plain,
                    gated_kick_drift=gated_kick_drift,
                    gated_close=gated_close, permute_cols=permute_cols,
                    apply_active=apply_active, levels_of=levels_of,
                    make_ladder=make_ladder)

    def _block_macro_step_sorted(self, loga0: float, loga1: float,
                                 eta: float, max_level: int):
        """One macro step of sorted fused block-KDK substeps (see
        _build_block_fns_sorted)."""
        fns = self._block_fast
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        om, ox = cfg.omega_m, cfg.omega_x
        s = self.state
        if cfg.newtonian:
            # static stepping: macro bounds are internal TIME, dk=dd=dt
            # (the merger family; config.newtonian notes)
            kf = df = lambda a, b: b - a
        else:
            kf = lambda a, b: float(cosmology.kick_factor(a, b, om, ox))
            df = lambda a, b: float(cosmology.drift_factor(a, b, om, ox))

        tau = kf(loga0, loga1)
        levels = fns["levels_of"](s.acc, s.acc_pm, tau, eta, max_level)
        level_max = int(jnp.max(levels))          # the ONE host read/macro
        # level census for eta calibration / telemetry (the reference logs
        # adaptive_level_maximum, utility.c:16; we keep the histogram)
        self.last_levels = np.bincount(np.asarray(levels),
                                       minlength=max_level + 1)
        nf = 1 << level_max
        sub = np.linspace(loga0, loga1, nf + 1)
        blocks = [1 << max(level_max - l, 0) for l in range(max_level + 1)]

        # per-substep kick/drift coefficient tables, host-precomputed
        # (Simpson integrals, initial.c:648-692); the ladder is then one
        # device dispatch for the whole macro (see make_ladder)
        dkh_open = jnp.asarray(
            [[0.5 * kf(sub[j], sub[j + b]) if j % b == 0 else 0.0
              for b in blocks] for j in range(nf)], dtype)
        dkh_close = jnp.asarray(
            [[0.5 * kf(sub[j + 1 - b], sub[j + 1])
              if (j + 1) % b == 0 else 0.0 for b in blocks]
             for j in range(nf)], dtype)
        dd = jnp.asarray(
            [df(sub[j], sub[j + 1]) for j in range(nf)], dtype)

        has_ids = s.ids is not None
        key = (nf, max_level, has_ids)
        ladder = self._ladder_cache.get(key)
        if ladder is None:
            ladder = fns["make_ladder"](nf, max_level, has_ids)
            self._ladder_cache[key] = ladder
        pos, vel, acc, acc_pm, levels, ids, diag = ladder(
            s.pos, s.vel, s.acc, s.acc_pm, levels, s.ids,
            dkh_open, dkh_close, dd)
        diag = dict(diag)
        diag["n_force_evals"] = nf
        self.last_level_max = level_max
        self.max_adaptive_level = max(self.max_adaptive_level, level_max)
        a_out = loga1 if cfg.newtonian else np.exp(loga1)
        state = SimState(pos=pos, vel=vel, acc=acc, acc_pm=acc_pm,
                         a=jnp.asarray(a_out, dtype), ids=ids)
        return state, diag

    def _block_macro_step(self, loga0: float, loga1: float, eta: float,
                          max_level: int):
        """One macro step as per-particle block-KDK substeps.

        Levels are frozen for the macro step (assigned from the opening
        forces); forces at each fine boundary are computed only for leaves
        holding closing particles (the reference's active_particle gating,
        done as kernel-row skipping).  With all levels at 0 this reduces
        exactly to the fixed KDK step."""
        if self._block_fast is None:
            self._block_fast = self._build_block_fns_sorted() or False
        if self._block_fast:
            return self._block_macro_step_sorted(loga0, loga1, eta,
                                                 max_level)
        if self._block_fns is None:
            self._build_block_fns()
        short, pm, kick, drift, levels_of = self._block_fns
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        om, ox = cfg.omega_m, cfg.omega_x
        s = self.state
        if cfg.newtonian:
            kf = df = lambda a, b: b - a        # macro bounds = time
        else:
            kf = lambda a, b: float(cosmology.kick_factor(a, b, om, ox))
            df = lambda a, b: float(cosmology.drift_factor(a, b, om, ox))

        tau = kf(loga0, loga1)
        levels = levels_of(s.acc, s.acc_pm, tau, eta, max_level)
        level_max = int(jnp.max(levels))
        nf = 1 << level_max
        sub = np.linspace(loga0, loga1, nf + 1)
        blocks = [1 << max(level_max - l, 0) for l in range(max_level + 1)]

        pos, vel, acc, acc_pm = s.pos, s.vel, s.acc, s.acc_pm
        overflow = False
        diag = {}
        for j in range(nf):
            dkh_open = jnp.asarray(
                [0.5 * kf(sub[j], sub[j + b]) if j % b == 0 else 0.0
                 for b in blocks], dtype)
            vel = kick(vel, acc, acc_pm, levels, dkh_open)
            pos = drift(pos, vel, df(sub[j], sub[j + 1]))

            closing = np.array([(j + 1) % b == 0 for b in blocks])
            active = jnp.asarray(closing)[levels]
            acc_new, dsub = short(pos, active)
            acc = jnp.where(active[:, None], acc_new, acc)
            if j == nf - 1:
                acc_pm = pm(pos)            # long range on the macro cadence
            dkh_close = jnp.asarray(
                [0.5 * kf(sub[j + 1 - b], sub[j + 1])
                 if (j + 1) % b == 0 else 0.0 for b in blocks], dtype)
            vel = kick(vel, acc, acc_pm, levels, dkh_close)
            if "overflow" in dsub:
                overflow = dsub["overflow"] | overflow
                if "overflow_bits" in dsub:
                    ovf_bits = dsub["overflow_bits"] | diag.get(
                        "overflow_bits", 0)
                    dsub = dict(dsub)
                    dsub["overflow_bits"] = ovf_bits
            diag = dsub
        if "overflow" in diag:
            diag = dict(diag)
            diag["overflow"] = overflow
        self.last_level_max = level_max
        self.max_adaptive_level = max(self.max_adaptive_level, level_max)
        a_out = loga1 if cfg.newtonian else np.exp(loga1)
        state = SimState(pos=pos, vel=vel, acc=acc, acc_pm=acc_pm,
                         a=jnp.asarray(a_out, dtype), ids=s.ids)
        return state, diag

    def _adaptive_level(self, dk: float, eta: float, max_level: int) -> int:
        """Refinement level from dt <= eta*sqrt(eps/(G*|a|_max)): the kick
        time unit is tau = G*dk (vel += acc * G * dk, photoNs.c:161)."""
        amax = float(jnp.max(jnp.sqrt(jnp.sum(
            (self.state.acc + self.state.acc_pm) ** 2, axis=-1))))
        if amax <= 0:
            return 0
        dt_req = eta * float(np.sqrt(
            self.cfg.soften_scale / (amax * self.cfg.grav_const)))
        tau = dk
        level = max(0, int(np.ceil(np.log2(max(tau / dt_req, 1e-30)))))
        return min(level, max_level)

    # -- IO ------------------------------------------------------------------
    def write_snapshot(self, a_tag: Optional[float] = None, shard: int = 0):
        """Gadget-2 snapshot <Out>/<Name>_<t>.<shard> (snapshot.c:538-549)."""
        cfg = self.cfg
        a_now = float(self.state.a)
        z = 1.0 / a_now - 1.0
        n = self.state.n
        head = GadgetHeader(
            npart=(0, n, 0, 0, 0, 0), npart_total=(0, n, 0, 0, 0, 0),
            mass=(0.0, cfg.particle_mass, 0.0, 0.0, 0.0, 0.0),
            time=a_now, redshift=z, boxsize=cfg.boxsize,
            omega_m=cfg.omega_m, omega_x=cfg.omega_x, hubble=cfg.hubble)
        tag = a_tag if a_tag is not None else a_now
        os.makedirs(cfg.output_path, exist_ok=True)
        path = os.path.join(cfg.output_path,
                            f"{cfg.output_name}_{tag:.4f}.{shard}")
        pos = np.asarray(self.state.pos)
        vel = np.asarray(self.state.vel)
        if self.state.ids is not None:
            # sorted-state runs carry particles in tree order; restore the
            # IC order on disk so snapshots are bit-comparable with
            # unsorted runs (the reference writes part[] in rank order,
            # snapshot.c:397-503)
            order = np.argsort(np.asarray(self.state.ids))
            pos, vel = pos[order], vel[order]
        write_gadget(path, head, pos, vel)
        return path
