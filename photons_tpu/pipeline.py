"""Walk/compute pipeline: the native host traversal overlapping device
compute (dual-buffer parity).

The reference overlaps its recursive tree walk with GPU compute through two
task buffers and pthread consumers (turn2compute_p2p / turn2compute_m2l,
fmm.c:378-400,538-560; deliberately serialized in the P2P-redundancy fork,
root README.md:14-16).  The TPU re-architecture keeps the whole step inside
one jitted graph by default (the traversal is itself a device computation),
but this module restores the reference's split as a selectable pipeline:

  device:  kick+drift  ->  tree build  |  PM solve (async)   | force apply
  host:                                | native C++ dual walk |

The host walks the freshly-built tree (native/traversal.cpp via ctypes)
while the device runs the PM long-range solve -- the analogue of the
reference's PM pthread + walk overlap (photoNs.c:103-120).  The walk's
flat pair lists are regrouped into the per-target-row tables the device
kernels consume and shipped once per step.

Whether the pipeline wins depends on the balance between traversal cost
(device) and PM cost (overlappable): ``scripts/bench_hostwalk.py`` measures
both engines honestly.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from photons_tpu import cosmology
from photons_tpu.config import SimConfig
from photons_tpu.native import native_traversal
from photons_tpu.ops.fmm_engine import fmm_apply
from photons_tpu.ops.traversal import InteractionLists
from photons_tpu.sim import CapacityOverflowError
from photons_tpu.state import SimState, make_state, wrap_periodic
from photons_tpu.tree.build import build_tree
from photons_tpu.utils.timers import PhaseTimers


def _rows_from_pairs(pairs, n_rows: int, cap: int, what: str):
    """Flat (target, source) pairs -> per-target (n_rows, cap) table."""
    tbl = np.full((n_rows, cap), -1, np.int32)
    if len(pairs) == 0:
        return tbl
    order = np.argsort(pairs[:, 0], kind="stable")
    t = pairs[order, 0]
    s = pairs[order, 1]
    starts = np.searchsorted(t, np.arange(n_rows))
    rank = np.arange(len(t)) - starts[t]
    if rank.max() >= cap:
        raise CapacityOverflowError(
            f"host walk {what} row overflow: {int(rank.max()) + 1} > {cap}")
    tbl[t, rank] = s
    return tbl


def lists_from_native(tree_np, theta: float, cutoff: Optional[float],
                      boxsize: Optional[float], adjacency_eps: float,
                      m2l_cap: int, p2p_cap: int) -> InteractionLists:
    """Run the native walk and regroup its output into InteractionLists."""
    m2l, m2l_lv, p2p = native_traversal(
        tree_np, theta, cutoff, boxsize, adjacency_eps)
    depth = tree_np.depth
    n_leaf = tree_np.n_leaf

    m2l_tables = []
    m2l_counts = []
    for d in range(1, depth + 1):
        sel = m2l[m2l_lv == d]
        m2l_tables.append(_rows_from_pairs(sel, 2 ** d, min(m2l_cap, 2 ** d),
                                           f"m2l[{d}]"))
        m2l_counts.append(np.int32(len(sel)))
    p2p_tbl = _rows_from_pairs(p2p, n_leaf, min(p2p_cap, n_leaf), "p2p")
    return InteractionLists(
        m2l=tuple(jnp.asarray(t) for t in m2l_tables),
        m2l_counts=tuple(jnp.asarray(c) for c in m2l_counts),
        p2p=jnp.asarray(p2p_tbl),
        p2p_count=jnp.asarray(np.int32(len(p2p))),
        overflow=jnp.asarray(False))


class _TreeView:
    """Host-side numpy view of the tree geometry for the native walk."""

    def __init__(self, tree):
        self.centers = tuple(np.asarray(c) for c in tree.centers)
        self.widths = tuple(np.asarray(w) for w in tree.widths)
        self.counts = tuple(np.asarray(c) for c in tree.counts)
        self.depth = len(self.centers) - 1
        self.n_leaf = self.centers[-1].shape[0]


@dataclasses.dataclass
class PipelinedSimulation:
    """KDK driver with the host-walk/device-compute pipeline."""

    cfg: SimConfig
    state: SimState
    p2p_backend: str = "jnp"
    timers: PhaseTimers = dataclasses.field(default_factory=PhaseTimers)

    def __post_init__(self):
        cfg = self.cfg
        grav = cfg.grav_const
        box = cfg.boxsize
        dtype = jnp.dtype(cfg.dtype)
        self._adjacency_eps = 1e-9 * box
        self._cutoff = cfg.traversal_cutoff if cfg.longshort else None
        self._box = box if cfg.periodic else None

        if cfg.longshort:
            from photons_tpu.pm.solver import green_function, pm_accel
            gf = green_function(cfg.n_side, box, cfg.split_radius,
                                dtype=dtype)

            @jax.jit
            def pm_fn(pos):
                return pm_accel(pos, gf, mass=cfg.particle_mass,
                                boxsize=box, n_side=cfg.n_side,
                                interlace=cfg.pm_interlace)
        else:
            @jax.jit
            def pm_fn(pos):
                return jnp.zeros_like(pos)

        @jax.jit
        def kick_drift(pos, vel, acc, acc_pm, dk, dd):
            dkh = 0.5 * dk * grav
            vel_half = vel + (acc + acc_pm) * dkh
            pos2 = pos + vel_half * dd
            if cfg.periodic:
                pos2 = wrap_periodic(pos2, box)
            return pos2, vel_half

        @jax.jit
        def build(pos):
            return build_tree(pos, mass=cfg.particle_mass,
                              leaf_size=cfg.leaf_size, lo=0.0, hi=box)

        n = self.state.pos.shape[0]

        @jax.jit
        def apply_lists(tree, lists):
            acc_all, diag = fmm_apply(tree, lists, cfg,
                                      p2p_backend=self.p2p_backend)
            return acc_all[:n], diag

        @jax.jit
        def kick(vel_half, acc, acc_pm, dk):
            return vel_half + (acc + acc_pm) * (0.5 * dk * grav)

        self._pm = pm_fn
        self._kick_drift = kick_drift
        self._build = build
        self._apply = apply_lists
        self._kick = kick
        self.last_diag = {}

    @classmethod
    def from_arrays(cls, cfg: SimConfig, pos, vel, a: Optional[float] = None,
                    p2p_backend: str = "jnp"):
        state = make_state(pos, vel,
                           a if a is not None else cfg.initial_scale_factor,
                           jnp.dtype(cfg.dtype))
        return cls(cfg=cfg, state=state, p2p_backend=p2p_backend)

    # ------------------------------------------------------------------ #
    def _forces(self, pos):
        """build -> [device PM || host walk] -> apply."""
        cfg = self.cfg
        with self.timers.measure("prep"):
            tree = self._build(pos)
        acc_pm = self._pm(pos)          # async dispatch: overlaps the walk
        with self.timers.measure("task"):       # walk + regroup (host side)
            view = _TreeView(tree)      # blocks on the build only
            lists = lists_from_native(
                view, cfg.open_angle, self._cutoff, self._box,
                self._adjacency_eps, cfg.m2l_cap_per_node,
                cfg.p2p_neighbor_cap)
        with self.timers.measure("p2p_self"):
            acc, diag = self._apply(tree, lists)
            jax.block_until_ready(acc)
        self.last_diag = {k: int(v) for k, v in diag.items()}
        return acc, acc_pm

    def compute_forces(self):
        acc, acc_pm = self._forces(self.state.pos)
        self.state = dataclasses.replace(self.state, acc=acc, acc_pm=acc_pm)

    def run(self, n_steps: Optional[int] = None,
            a_final: Optional[float] = None):
        cfg = self.cfg
        n_steps = n_steps if n_steps is not None else cfg.n_steps
        a_final = a_final if a_final is not None else cfg.final_scale_factor
        a0 = float(self.state.a)
        dk, dd = cosmology.step_factors(a0, a_final, n_steps,
                                        cfg.omega_m, cfg.omega_x)
        a_grid = np.exp(np.linspace(np.log(a0), np.log(a_final),
                                    n_steps + 1))
        self.compute_forces()
        for i in range(n_steps):
            t0 = time.perf_counter()
            s = self.state
            pos2, vel_half = self._kick_drift(
                s.pos, s.vel, s.acc, s.acc_pm, float(dk[i]), float(dd[i]))
            acc, acc_pm = self._forces(pos2)
            vel = self._kick(vel_half, acc, acc_pm, float(dk[i]))
            self.state = SimState(
                pos=pos2, vel=vel, acc=acc, acc_pm=acc_pm,
                a=jnp.asarray(a_grid[i + 1], s.pos.dtype))
            float(self.state.pos[0, 0])          # completion fence
            self.timers.add("step", time.perf_counter() - t0)
        return self.state
