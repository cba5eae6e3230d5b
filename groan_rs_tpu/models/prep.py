"""System-preparation tools (surpass — the `gmx insert-molecules`,
`gmx solvate`, and `gmx genion` workloads; the reference library has no
topology assembly at all).

All clash tests are min-image device kernels (the freevolume/occlusion
machinery); topology assembly rides `Topology.concat`.
"""

from __future__ import annotations

import numpy as np

from ..core.topology import StrColumn, Topology
from ..errors import GroupError, ParallelError
from ..ops import pbc


def _require_box(system, what):
    if system.simbox is None:
        raise ParallelError(f"{what} needs a simulation box")
    if not system.simbox.is_orthogonal():
        raise ParallelError(
            f"{what} builds/fills rectangular solvent grids (the gmx "
            "solvate/insert-molecules convention) and supports "
            "orthorhombic boxes; convert the box or solvate before "
            "shearing")
    return np.array([system.simbox.x, system.simbox.y, system.simbox.z],
                    np.float32)


_FAR = np.float32(1e6)


def _pad_pow2(arr):
    """Pad [N, 3] coords to the next power of two with far-away
    sentinels, so the jitted clash kernel compiles once per bucket."""
    n = arr.shape[0]
    cap = 1
    while cap < max(n, 1):
        cap *= 2
    if cap == n:
        return arr
    pad = np.full((cap - n, 3), _FAR, np.float32)
    return np.concatenate([arr.astype(np.float32), pad])


_kernel = None


def _min_dist2(cand, existing_padded, box):
    """[C, M, 3] candidates -> [C] min squared min-image distance to
    the padded existing coords.  One module-level jitted kernel: jit's
    shape cache makes each (batch, M, bucket) combination compile
    once.  Sentinel rows (coords at 1e6 nm) are masked to inf."""
    global _kernel
    if existing_padded.shape[0] == 0:
        return np.full((cand.shape[0],), np.inf, np.float32)
    import jax
    import jax.numpy as jnp

    if _kernel is None:
        @jax.jit
        def run(cand, ex, bx):
            far = jnp.any(ex > _FAR / 2, axis=-1)        # [N]

            def one(c):
                d = pbc.min_image(c[:, None, :] - ex[None, :, :], bx)
                d2 = jnp.sum(d * d, axis=-1)
                return jnp.min(jnp.where(far[None, :], jnp.inf, d2))

            return jax.lax.map(one, cand)

        _kernel = run
    return np.asarray(_kernel(jnp.asarray(cand, jnp.float32),
                              jnp.asarray(existing_padded, jnp.float32),
                              jnp.asarray(box, jnp.float32)))


def _rotations(key, n):
    """[n, 3, 3] uniform random rotations (quaternion method)."""
    import jax

    q = jax.random.normal(key, (n, 4))
    q = np.asarray(q, np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def _assemble(base, base_positions, parts, name):
    """New System: `base` (with `base_positions`) + (topology, positions)
    parts appended, residues renumbered to stay unique."""
    from ..system import System

    topos = [base.topology] + [t for t, _ in parts]
    pos = np.concatenate([np.asarray(base_positions, np.float32)]
                         + [np.asarray(p, np.float32) for _, p in parts])
    topo = Topology.concat(topos)
    # renumber appended residues above the base's max
    next_res = int(base.topology.resnum.max()) + 1 if base.topology.n_atoms \
        else 1
    off = base.topology.n_atoms
    resnum = topo.resnum.copy()
    for t, _ in parts:
        r = t.resnum
        uniq, inv = np.unique(r, return_inverse=True)
        resnum[off:off + t.n_atoms] = next_res + inv
        next_res += len(uniq)
        off += t.n_atoms
    topo.resnum = resnum
    return System(name, topo, simbox=base.simbox, positions=pos)


def insert_molecules(system, molecule, n: int, *, radius: float = 0.21,
                     seed: int = 0, tries: int = 1000,
                     batch: int = 64):
    """Insert `n` copies of `molecule` (a System) at random positions
    and orientations without steric clashes (surpass — the
    `gmx insert-molecules` workload).

    A candidate placement is rejected when ANY of its atoms lies within
    `radius` nm (min-image) of an already-present atom (system +
    earlier insertions).  Candidates are drawn `batch` at a time from a
    seeded `jax.random` stream and clash-checked as one device kernel;
    up to `tries` candidates are spent per copy.

    Returns (new System, n_inserted); raises ParallelError if fewer
    than `n` fit within the trial budget.
    """
    import jax

    box = _require_box(system, "insert_molecules")
    mol_pos = np.asarray(molecule.positions, np.float64)
    if mol_pos.shape[0] == 0:
        raise GroupError("molecule has no atoms", code="EmptyGroup")
    mol_pos = mol_pos - mol_pos.mean(axis=0)

    existing = np.asarray(system.positions, np.float32)
    key = jax.random.PRNGKey(seed)
    parts = []
    r2 = float(radius) ** 2
    spent = 0
    while len(parts) < n and spent < n * tries:
        key, k1, k2 = jax.random.split(key, 3)
        centers = np.asarray(jax.random.uniform(
            k1, (batch, 3)), np.float64) * box[None, :]
        rots = _rotations(k2, batch)
        cand = (rots @ mol_pos.T).transpose(0, 2, 1) \
            + centers[:, None, :]                    # [B, M, 3]
        cand = cand.astype(np.float32)
        d2 = _min_dist2(cand, _pad_pow2(existing), box)
        spent += batch
        ok = np.flatnonzero(d2 > r2)
        if ok.size:
            # accept only the first hit: the rest of the batch was not
            # clash-checked against the newly placed copy — redraw
            i = int(ok[0])
            parts.append((molecule.topology.copy(), cand[i]))
            existing = np.concatenate([existing, cand[i]])
    if len(parts) < n:
        raise ParallelError(
            f"could only insert {len(parts)}/{n} molecules in "
            f"{spent} tries (radius {radius} nm)")
    out = _assemble(system, system.positions, parts,
                    f"{system.get_name()} +{n} inserted")
    return out, len(parts)


def _molecules_by_residue(system, sel_idx):
    """Group selected atom indices by residue number -> list of arrays."""
    res = np.asarray(system.topology.resnum)[sel_idx]
    order = np.argsort(res, kind="stable")
    sel = sel_idx[order]
    res = res[order]
    cuts = np.flatnonzero(np.diff(res)) + 1
    return np.split(sel, cuts)


def solvate(system, solvent, *, radius: float = 0.24,
            solvent_sel: str = "all"):
    """Fill `system`'s box with copies of a pre-equilibrated `solvent`
    box (surpass — the `gmx solvate` workload).

    The solvent System (its box = the tile) is replicated on a grid
    covering the target box; solvent molecules (grouped by residue)
    are kept when their first atom falls inside the target box AND no
    atom of the molecule clashes (< `radius` nm min-image) with the
    solute.

    Returns (new System, n_solvent_molecules).
    """
    box = _require_box(system, "solvate")
    sbox = _require_box(solvent, "solvate (solvent)")
    from .pipeline import _sel_indices

    sol_idx = _sel_indices(solvent, solvent_sel)
    if sol_idx.size == 0:
        raise GroupError("solvent selection is empty", code="EmptyGroup")
    mols = _molecules_by_residue(solvent, sol_idx)
    spos = np.asarray(solvent.positions, np.float64)

    reps = np.maximum(np.ceil(box / sbox).astype(int), 1)
    solute = _pad_pow2(np.asarray(system.positions, np.float32))
    r2 = float(radius) ** 2

    kept_t, kept_p = [], []
    n_kept = 0
    for ix in range(reps[0]):
        for iy in range(reps[1]):
            for iz in range(reps[2]):
                shift = np.array([ix, iy, iz], np.float64) * sbox
                for m in mols:
                    p = spos[m] + shift[None, :]
                    if not (p[0] < box).all():
                        continue
                    kept_t.append(m)
                    kept_p.append(p)
    if not kept_p:
        return _assemble(system, system.positions, [],
                         f"{system.get_name()} solvated"), 0
    # one device pass: clash-check every kept molecule vs the solute
    sizes = np.array([p.shape[0] for p in kept_p])
    if np.unique(sizes).size == 1:
        cand = np.stack(kept_p).astype(np.float32)
        d2 = _min_dist2(cand, solute, box)
    else:
        d2 = np.array([float(_min_dist2(
            p[None].astype(np.float32), solute, box)[0])
            for p in kept_p])
    parts = []
    n_solute = np.asarray(system.positions).shape[0]
    for ok, m, p in zip(d2 > r2, kept_t, kept_p):
        if n_solute and not ok:
            continue
        parts.append((solvent.topology.subset(m), p.astype(np.float32)))
        n_kept += 1
    out = _assemble(system, system.positions, parts,
                    f"{system.get_name()} solvated")
    return out, n_kept


_ION_PROPS = {
    "NA": ("NA", 22.9898, 1.0), "CL": ("CL", 35.453, -1.0),
    "K": ("K", 39.0983, 1.0), "CA": ("CA", 40.078, 2.0),
    "MG": ("MG", 24.305, 2.0),
}


def genion(system, n_positive: int, n_negative: int, *,
           solvent: str = "resname SOL", positive: str = "NA",
           negative: str = "CL", seed: int = 0):
    """Replace random solvent molecules with monatomic ions (surpass —
    the `gmx genion` workload).

    Each replaced solvent molecule (grouped by residue from the
    `solvent` selection) becomes one ion at its first atom's position;
    ion name/resname/charge/mass come from the built-in table
    (NA/CL/K/CA/MG).

    Returns (new System, ion_indices [n_pos + n_neg] into the new
    system).
    """
    import jax

    for ion in (positive, negative):
        if ion.upper() not in _ION_PROPS:
            raise ParallelError(f"unknown ion '{ion}' (have "
                                f"{sorted(_ION_PROPS)})")
    from .pipeline import _sel_indices

    sol = _sel_indices(system, solvent)
    if sol.size == 0:
        raise GroupError(f"solvent selection '{solvent}' is empty",
                         code="EmptyGroup")
    mols = _molecules_by_residue(system, sol)
    n_total = n_positive + n_negative
    if n_total > len(mols):
        raise ParallelError(
            f"need {n_total} solvent molecules, have {len(mols)}")
    perm = np.asarray(jax.random.permutation(
        jax.random.PRNGKey(seed), len(mols)))
    chosen = [mols[int(i)] for i in perm[:n_total]]

    pos = np.asarray(system.positions, np.float32)
    drop = np.concatenate(chosen) if chosen else np.empty(0, np.int64)
    keep = np.setdiff1d(np.arange(system.topology.n_atoms), drop)
    base_topo = system.topology.subset(keep)

    from ..system import System

    base = System(system.get_name(), base_topo, simbox=system.simbox,
                  positions=pos[keep])

    parts = []
    for i, m in enumerate(chosen):
        name = (positive if i < n_positive else negative).upper()
        sym, mass, charge = _ION_PROPS[name]
        t = Topology(1)
        t.atomnum = np.array([1], np.int64)
        t.resnum = np.array([1], np.int64)
        t.resname = StrColumn(values=np.array([name]))
        t.atomname = StrColumn(values=np.array([name]))
        t.element_symbol = StrColumn(values=np.array([sym.capitalize()]))
        t.mass = np.array([mass], np.float32)
        t.has_mass = np.array([True])
        t.charge = np.array([charge], np.float32)
        t.has_charge = np.array([True])
        parts.append((t, pos[m[0]][None, :]))
    out = _assemble(base, base.positions, parts,
                    f"{system.get_name()} +ions")
    ion_idx = np.arange(keep.size, keep.size + n_total)
    return out, ion_idx


def genconf(system, nbox, *, dist=None):
    """Replicate a structure on an nx x ny x nz grid (surpass — the
    `gmx genconf -nbox` workload).

    Each copy is shifted by the box vectors (+ optional extra `dist`
    [3] nm spacing); the result's box scales accordingly.  Residues
    renumber uniquely (gmx-compatible behavior).

    Returns the replicated System.
    """
    from ..core.simbox import SimBox
    from ..system import System

    nbox = np.asarray(nbox, np.int64).reshape(3)
    if (nbox < 1).any():
        raise ParallelError(f"nbox must be >= 1 per axis, got {nbox}")
    box = _require_box(system, "genconf")
    extra = np.zeros(3) if dist is None else np.asarray(dist, np.float64)
    cell = box + extra
    pos = np.asarray(system.positions, np.float64)

    parts = []
    first = True
    base = None
    for ix in range(int(nbox[0])):
        for iy in range(int(nbox[1])):
            for iz in range(int(nbox[2])):
                shift = np.array([ix, iy, iz], np.float64) * cell
                p = (pos + shift[None, :]).astype(np.float32)
                if first:
                    base = System(
                        system.get_name(), system.topology.copy(),
                        simbox=None, positions=p)
                    first = False
                else:
                    parts.append((system.topology.copy(), p))
    out = _assemble(base, base.positions, parts,
                    f"{system.get_name()} x{int(nbox.prod())}")
    out.simbox = SimBox.from_lengths(*(cell * nbox))
    return out
