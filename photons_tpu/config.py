"""Simulation configuration.

Folds the reference's two config tiers into one runtime dataclass:
the key-value parameter file (``initial.c:25-202`` in the reference) and the
compile-time feature flags (``-DLONGSHORT``, ``-DPERIODIC_CONDITION``,
``-DPMTHREAD``, ``PMONLY`` -- ``1_Indexing/Makefile:10``) become plain
boolean fields.

Derived quantities replicate ``initial.c:324-346``:

- ``split_radius  = 1.25 * boxsize / n_side``  (unless SPLITSCALE given)
- ``cutoff_radius = 4.5  * split_radius``
- ``soften_scale  = 0.03 * boxsize / n_part_total**(1/3)`` (unless SOFTENING)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """All runtime knobs of the simulation (box, cosmology, solver, IO)."""

    # --- box & particles -------------------------------------------------
    boxsize: float = 100000.0           # kpc/h (Gadget length unit)
    n_part_total: int = 32768
    mass_part: float = 0.0              # 1e10 Msun/h; 0 -> derived from Omega_m

    # --- cosmology (flat LCDM) -------------------------------------------
    omega_m: float = 0.25
    omega_x: float = 0.75
    hubble: float = 0.7
    grav_const: float = 43007.105732    # G in Gadget units (demo/lcdm_g2.run:29)
    initial_redshift: float = 49.0

    # --- force solver ----------------------------------------------------
    open_angle: float = 0.4             # OPENANGLE: dual-tree MAC theta
    n_side: int = 32                    # NumMeshSide: PM mesh cells per side
    leaf_size: int = 16                 # MaxPackage: particle capacity per leaf
    split_scale: Optional[float] = None     # SPLITSCALE override of splitRadius
    softening: Optional[float] = None       # SOFTENING override of SoftenScale
    longshort: bool = True              # Ewald long/short split (-DLONGSHORT)
    periodic: bool = True               # -DPERIODIC_CONDITION
    pm_only: bool = False               # PMONLY mode (photoNs.c:70-126)
    newtonian: bool = False             # static (non-cosmological) stepping:
    # dk = dd = dt and the scale-factor column carries internal time.  The
    # reference's driver only integrates in log-a, but its packaged
    # ic_merger.gdt2 is a z=0 galaxy (header time/boxsize/Omega all zero)
    # for which comoving stepping is meaningless.
    fused_step: bool = True             # one jit per KDK step; False splits
    # kick/drift | FMM | PM into separate device programs so peak HBM is
    # the max of the stages, not their co-scheduled sum (needed at 256^3
    # on a single 16 GB v5e; costs the measured ~10-20% PM/FMM overlap)
    sorted_state: bool = False          # keep particle state in the tree's
    # space-filling-curve order across steps: the force engine then returns
    # leaf-order results directly and the step gathers vel/ids by perm,
    # eliminating the (N, 3) unsort scatter (~1.4 s at 256^3 on a v5e --
    # a TPU row scatter costs ~10x a gather).  Particle identity moves to
    # an explicit ids column (fmm engines, single device)
    p2p_passes: int = 1                 # segmented near-field multi-pass:
    # process each leaf's neighbor row in this many p2p_cap-wide segments
    # from ONE cached traversal (the reference's LEN_TASK task-buffer
    # flush loop, 2_Redundant/src/fmm.c:921,377-418, as a space-slice).
    # Elastic recovery increments it automatically once growing
    # p2p_neighbor_cap would pass p2p_cap_budget -- extreme clustering
    # then runs at bounded memory instead of growing until HBM OOM.
    p2p_cap_budget: int = 512           # largest p2p_neighbor_cap elastic
    # recovery may grow to before switching to segmented passes; the
    # (nleaf, cap) table + kernel workspace scale linearly with it
    hbm_frugal: Optional[bool] = None   # HBM-frugal stepping: donate the
    # whole state pytree into the fused step (XLA then frees the dead
    # pre-kick acc/vel buffers inside the program), allocate deferred
    # (1, 3) acceleration placeholders, and keep the elastic-recovery
    # rollback state as HOST copies instead of device arrays.  None
    # (default) auto-enables at n_part_total >= 5e7, where the resident
    # state (~7 GB at 512^3) plus its rollback alias plus the force
    # program's workspace exceed a 16 GB chip (measured round-4 OOM);
    # smaller runs keep the zero-copy device rollback.
    list_reuse: int = 1                 # rebuild the tree + interaction
    # lists every k-th step and reuse them in between (Verlet-list
    # amortization of the ~2.2 s prep+task cost at 256^3).  Reuse steps
    # keep the frozen sort and recompute only AABBs/multipoles from the
    # moved positions; validity is guaranteed by verlet_skin + an on-device
    # drift monitor that trips the elastic recovery.  Requires sorted_state
    verlet_skin: float = 0.1            # traversal-acceptance margin as a
    # fraction of the cutoff: lists are built accepting pairs within
    # cutoff*(1+verlet_skin), so they stay complete while every particle
    # has moved < verlet_skin*cutoff/2 since the rebuild (classic
    # Verlet-list skin); the drift monitor enforces exactly this bound

    # --- time integration -------------------------------------------------
    n_steps: int = 100                  # reference hardcodes 100 (photoNs.c:384)
    final_scale_factor: float = 1.0

    # --- numerics ----------------------------------------------------------
    dtype: str = "float32"              # device dtype for particle state
    pm_gradient: str = "fd4k"           # force differentiation: "fd4k"
    # (default) evaluates the reference's 4th-order stencil in k-space
    # (identical discrete operator by the convolution theorem, immune to
    # the f32 differencing cancellation -- pm/solver.gradient_fd4_k);
    # "fd4" is the literal real-space stencil (partmesh.c:1318-1383);
    # "spectral" exact-ik differentiation
    pm_interlace: str = "read"          # interlaced CIC ("off"/"read"/
    # "full"; bools accepted: True == "full").  "full" adds a second
    # half-cell-shifted paint AND readout, phase-aligned in k and
    # averaged -- the classic odd-alias-image cancellation (Hockney &
    # Eastwood) the reference's deconv^4 (conv.f90:224) cannot provide.
    # MEASURED caveat: "full" helps stochastic states (uniform-random
    # 2.19e-3 -> 8.4e-4 on the 32^3 rs=1.25c ladder) but HURTS
    # displaced-lattice states (Zel'dovich-type, mesh = 2x particle
    # grid: 2.3e-3 -> 6.6e-3; flagship 256^3 measured 2.19e-3 ->
    # 7.0e-3): the +H/2 shift parks every lattice particle exactly on
    # the shifted grid's CIC kink, so the paint's displacement response
    # is one-sided.  "read" interlaces only the readout (no kink
    # pathology; helps both states mildly: lattice 2.34 -> 1.81e-3,
    # uniform 2.19 -> 1.96e-3).  "read" (the default) is what closes
    # the <1e-3 budget on the z=0 clustered flagship: rs 2.0 cells
    # alone measures 1.02e-3 there, rs 2.0 + read 9.57e-4; uniform
    # passes either way (8.44e-4 at 'off')
    # (artifacts/split_geometry256_r5.json)
    cic_backend: str = "auto"           # CIC paint/readout: "auto" uses the
    # Pallas leaf-brick kernels on TPU (pm/cic_pallas.py) and XLA
    # scatter/gather elsewhere; "xla" / "pallas" force a choice
    cic_tile: int = 32                  # Pallas CIC brick cells per x/y axis
    # (a leaf's CIC footprint must fit; overflow is flagged like the
    # traversal capacities)
    cic_straddler_cap: int = 8          # leaves whose footprint exceeds the
    # brick tile (SFC segments crossing major Hilbert transitions) are
    # routed through an XLA scatter/gather residual path instead of
    # triggering a recompile recovery; only > cap straddlers overflow
    # capacity knobs for static-shape traversal (see ops/traversal.py)
    p2p_neighbor_cap: int = 256         # max P2P source leaves per target leaf
    m2l_cap_per_node: int = 64          # max M2L sources per target node/level
    open_cap_per_node: int = 512        # frontier pairs per node per level
    open_cap_levels: "Optional[Tuple[int, ...]]" = None
    # leaf-anchored per-level open-cap schedule (entry 0 = deepest
    # internal level, then upward; shallower levels reuse the last
    # entry).  None = uniform open_cap_per_node.  The deep traversal
    # levels are gather-bound and their candidate width is 2x the open
    # cap of the level above, so capacities sized to measured occupancy
    # (expand_open_caps docstring) cut most of the traversal cost;
    # overflow trips the same elastic recovery as the uniform cap
    p2p_hybrid_threshold: int = 64      # engine 'fmm-hybrid': leaves with
    # <= threshold neighbor rows take the redundant (pre-gathered stream)
    # kernel, hotter leaves the indexing (in-kernel gather) one -- the
    # K-bucketed composition of the reference's two GPU layouts
    # (ops/p2p_pallas.p2p_hybrid)
    discard_margin: float = 0.0         # inflate the traversal's discard
    # horizon to cutoff*(1+margin) (see traversal_cutoff).  0.11 covers
    # one leaf shell at the 256^3 flagship geometry -- the lever for the
    # Zel'dovich-IC truncation transient (VERDICT r4 missing-4)
    traversal_quantized: bool = False   # classify MAC candidates from
    # u16 fixed-point packed node geometry (3 u32 gathers instead of 7
    # f32/i32): conservative-identical pair sets, ~2.3x less gather
    # traffic at the deep levels (ops/traversal.pack_node_geometry)

    # --- parallelism -------------------------------------------------------
    n_devices: int = 1                  # spatial shards (NprocVertical*Horizon)
    n_proc_vertical: int = 0            # NprocVertical: x extent of the 2-D
    n_proc_horizon: int = 0             # NprocHorizon: y extent; 0 0 = auto
    shard_capacity_factor: float = 1.25  # per-shard particle padding factor
    # (was 2.0 through round 3: the hard x2 doubled every tree/traversal
    # shape at d>1 -- the same waste measured as a 3.35x step tax at d=1.
    # 1.25 keeps shapes near-tight; rebalancing keeps shards even like the
    # reference (domains.c:86-144), and overflow now trips the sharded
    # elastic recovery (gather -> grow -> redistribute) instead of dying)
    ghost_cap_factor: float = 1.0       # ghost buffer size / shard capacity
    send_cap_factor: float = 0.5        # migration buffer size / capacity
    pm_patch_factor: float = 1.5        # local PM patch size / uniform brick
                                        # (allowed rebalance growth)
    surface_leaf_frac: float = 1.0      # open-boundary far-field ring: the
    # carry ships only leaves within the ghost horizon of the shard's own
    # brick boundary (the interaction surface; prepare_sendtree2 parity,
    # remotes.c:337-446) -- this caps that packed buffer at
    # frac * n_leaf per shard.  The safe default 1.0 can never overflow
    # (every leaf fits); production meshes should set the measured surface
    # fraction (ring bytes/stage scale with it; see diag['ring_bytes']).
    # Small shards (few leaf widths across) are ~all surface, so there is
    # no universally-safe smaller default.

    # --- IO ---------------------------------------------------------------
    code_proj: str = "demo"
    input_path: str = ""
    output_path: str = "."
    output_name: str = "snapshot"
    snap_format: int = 2                # 2 = Gadget-2, -2 = uniform random IC
    snap_number: int = 1                # files per snapshot on read
    snap_times: Tuple[float, ...] = (1.0,)

    # ------------------------------------------------------------------ #
    # derived quantities (initial.c:324-346)
    # ------------------------------------------------------------------ #
    @property
    def split_radius(self) -> float:
        if self.split_scale is not None and self.split_scale > 0:
            return float(self.split_scale)
        return 1.25 * self.boxsize / self.n_side

    @property
    def cutoff_radius(self) -> float:
        return 4.5 * self.split_radius

    @property
    def traversal_cutoff(self) -> float:
        """Near-field search horizon: ``cutoff_radius * (1+discard_margin)``.

        The traversal discards node pairs whose minimum gap exceeds this
        (fmm.c:306-314 -DLONGSHORT); the P2P kernels apply the erfc-screened
        law with no hard truncation, so any margin only ADDS erfc-damped
        tail pairs -- it can never change which forces are correct, only
        how much of the screened tail is summed in the near field.  On
        lattice-coherent states (Zel'dovich ICs) the leaf gaps quantize the
        discard boundary ~11% beyond the cutoff, where the dropped
        erfc(r/2rs) tail reads against a near-cancelling net force
        (BENCH_NOTES round-5 'zeld-IC rs sensitivity'); a margin of one
        leaf shell recovers it.  Ghost exchange and PM brick halos size to
        this same horizon so sharded runs stay exact.
        """
        return self.cutoff_radius * (1.0 + self.discard_margin)

    @property
    def soften_scale(self) -> float:
        if self.softening is not None and self.softening >= 0:
            return float(self.softening)
        return 0.03 * self.boxsize / self.n_part_total ** (1.0 / 3.0)

    @property
    def initial_scale_factor(self) -> float:
        return 1.0 / (1.0 + self.initial_redshift)

    @property
    def frugal(self) -> bool:
        """Resolved hbm_frugal (None -> auto by particle count)."""
        if self.hbm_frugal is not None:
            return bool(self.hbm_frugal)
        return self.n_part_total >= 50_000_000

    @property
    def particle_mass(self) -> float:
        """Particle mass; derived from the critical density if not given.

        Mirrors ``ic_uniform`` (initial.c:605-606):
        m = Omega_m * 3*H0^2/(8 pi G) * V / N with H0 = 0.1 in code units.
        """
        if self.mass_part > 0:
            return self.mass_part
        h0_sq = 0.01  # (0.1)^2, code units
        rho_crit = 3.0 * h0_sq / (8.0 * math.pi * self.grav_const)
        return self.omega_m * rho_crit * self.boxsize ** 3 / self.n_part_total

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


# --------------------------------------------------------------------------
# Parameter-file parser (key-value text, '#' comments) -- initial.c:25-202.
# Accepts the reference's .run files verbatim.
# --------------------------------------------------------------------------

_KEYMAP = {
    "CODEPROJ": ("code_proj", str),
    "INPUTPATH": ("input_path", str),
    "OUTPUTPATH": ("output_path", str),
    "OUTPUTNAME": ("output_name", str),
    "SNAPFORMAT": ("snap_format", int),
    "SNAPNUMBER": ("snap_number", int),
    "OPENANGLE": ("open_angle", float),
    "BOXSIZE": ("boxsize", float),
    "OMEGAM": ("omega_m", float),
    "OMEGAX": ("omega_x", float),
    "HUBBLE": ("hubble", float),
    "SOFTENING": ("softening", float),
    "SPLITSCALE": ("split_scale", float),
    "GRAVCONSTANT": ("grav_const", float),
    "INITIALTIME": ("initial_redshift", float),
    "NUMPART": ("n_part_total", int),
    "NUMMESHSIDE": ("n_side", int),
    "MAXPACKAGE": ("leaf_size", int),
    "NUMTHREAD": (None, int),           # accepted, unused on TPU
    "NPROCVERTICAL": ("n_proc_vertical", int),   # 2-D process grid shape
    "NPROCHORIZON": ("n_proc_horizon", int),     # (initial.c:253-254)
}


def load_parameter_file(path: str, **overrides) -> SimConfig:
    """Parse a photoNs-2 parameter file into a :class:`SimConfig`.

    Unknown keys raise (the reference exits on typos, initial.c:33-37).
    ``SnapTime`` may repeat; values accumulate into ``snap_times``.
    """
    kw = {}
    snap_times = []
    with open(path, "r") as fh:
        for raw in fh:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split(None, 1)
            if len(parts) != 2:
                raise ValueError(f"malformed parameter line: {raw!r}")
            key, value = parts[0].upper(), parts[1].strip()
            if key == "SNAPTIME":
                snap_times.extend(float(v) for v in value.split())
                continue
            if key not in _KEYMAP:
                raise ValueError(f"unknown parameter {parts[0]!r} in {path}")
            field, cast = _KEYMAP[key]
            if field is not None:
                kw[field] = cast(value)
    if snap_times:
        kw["snap_times"] = tuple(snap_times)
    kw.update(overrides)
    return SimConfig(**kw)
