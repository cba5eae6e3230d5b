"""Membrane and interfacial-water analyses (leaflets, order parameters, density maps/profiles, water orientation).

Split out of models/pipeline.py (one module per analysis family); shared
loaders/helpers live in `models.pipeline`.  All public names remain
importable as `groan_rs_tpu.models.<name>` and `groan_rs_tpu.models.pipeline.<name>`.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.dimension import Dimension
from ..errors import GroupError, ParallelError, RMSDError
from ..ops import center as center_ops
from ..ops import distances as distance_ops
from ..ops import geometry
from ..ops import pbc
from ..ops import rmsd as rmsd_ops

from .pipeline import (  # shared core helpers
    TrajectoryAnalysis,
    _AXIS,
    _E_OVER_EPS0_NM,
    _named_group,
    _resident_group_pos,
    _residue_blocks,
    _sel_indices,
    _system_triclinic,
    _transient_indices,
    _unit_tables,
)


def _mi(d, box):
    """Per-frame minimum image: `box` is [3] lengths or [3, 3] triclinic
    row matrix (exact 27-image search)."""
    return (pbc.min_image_triclinic(d, box) if box.ndim == 2
            else pbc.min_image(d, box))


def _ctr(pf, box, w=None):
    """Per-frame refined center dispatching on the box representation."""
    if box.ndim == 2:
        return center_ops.center_triclinic(pf, box, weights=w)
    return center_ops.center(pf, box, weights=w)


def leaflets(system, trajectory, heads: str, *, axis: str = "z",
             batch_size: int = 32):
    """Per-frame membrane leaflet assignment + thickness (surpass — the
    classification step of the reference author's own downstream
    membrane tools (gorder / FATSLiM workflows); groan_rs itself has no
    leaflet analysis).

    `heads` is a group naming ONE head atom per lipid (e.g. created
    from "name P").  Per frame, the membrane center along `axis` is the
    Bai-Breen circular mean of the head coordinates (PBC-robust: a
    bilayer wrapped across the box face still classifies correctly);
    each head's minimum-image displacement from that center signs its
    leaflet.  Thickness is the axis distance between the two leaflets'
    mean head positions.  Everything evaluates batched on the
    device-resident trajectory.

    Returns a dict: 'indices' [L] (head atom indices), 'leaflet'
    [F, L] (+1 upper / -1 lower), 'thickness' [F] (nm), 'center' [F]
    (nm, wrapped into [0, box_axis)).
    """
    import jax
    import jax.numpy as jnp

    ax = {"x": 0, "y": 1, "z": 2}.get(axis)
    if ax is None:
        raise GroupError(f"unknown axis '{axis}' (use 'x'|'y'|'z')",
                         code="InvalidAxis")
    gsel, pos, boxes, _ = _resident_group_pos(
        system, trajectory, heads, batch_size)
    if boxes.ndim == 3:
        # Gromacs lower-triangular H: only the c row has a z component,
        # so z-wraps are exact multiples of H[2, 2] and the circular-
        # mean machinery below is EXACT for axis='z'; x/y coordinates
        # shift under several box vectors and have no scalar period
        if ax != 2:
            raise ParallelError(
                "leaflets on a triclinic box supports axis='z' only "
                "(x/y have no scalar period under a sheared cell)")
        boxes = boxes[:, :, ax]  # [F, 3] rows' z components; [:, 2] = c_z
    if gsel.shape[0] < 2:
        raise GroupError(
            f"group '{heads}' must name at least 2 head atoms",
            code="EmptyGroup")

    @jax.jit
    def _assign(pos, boxes):
        z = pos[..., ax]                              # [F, L]
        lz = boxes[:, ax]                             # [F]
        theta = (z % lz[:, None]) * (2 * jnp.pi / lz[:, None])
        xi = jnp.mean(jnp.cos(theta), axis=1)
        zeta = jnp.mean(jnp.sin(theta), axis=1)
        center = (jnp.arctan2(-zeta, -xi) + jnp.pi) * lz / (2 * jnp.pi)
        d = z - center[:, None]
        d = d - lz[:, None] * jnp.round(d / lz[:, None])   # min image
        leaf = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
        up = leaf > 0
        n_up = jnp.maximum(jnp.sum(up, axis=1), 1)
        n_dn = jnp.maximum(jnp.sum(~up, axis=1), 1)
        mean_up = jnp.sum(jnp.where(up, d, 0.0), axis=1) / n_up
        mean_dn = jnp.sum(jnp.where(up, 0.0, d), axis=1) / n_dn
        return leaf, mean_up - mean_dn, center % lz

    leaf, thick, center = (np.asarray(a) for a in _assign(pos, boxes))
    return {"indices": gsel, "leaflet": leaf,
            "thickness": thick, "center": center}

def potential_profile(system, trajectory, group: str, *, axis: str = "z",
                      n_bins: int = 100, batch_size: int = 32):
    """Electrostatic potential profile along a box axis (surpass —
    `gmx potential`; absent from the reference).

    The per-frame charge density profile rho(z) evaluates on device
    (`add_density_profile(mode='charge')`, e/nm^3 in fractional slabs);
    Poisson's equation is then integrated twice per frame host-side
    (E(z) = (1/eps0) int rho dz', psi(z) = -int E dz', rectangle rule on
    the slab grid, psi(0) = 0 at the box bottom — gmx potential's
    convention) and averaged over frames.

    Returns a dict: 'centers' [n_bins] (nm, mean box), 'rho' [n_bins]
    (e/nm^3, frame mean), 'field' [n_bins] (V/nm), 'psi' [n_bins] (V).
    """
    ax = {"x": 0, "y": 1, "z": 2}.get(axis)
    if ax is None:
        raise GroupError(f"unknown axis '{axis}' (use 'x'|'y'|'z')",
                         code="InvalidAxis")
    pipe = TrajectoryAnalysis(
        system, triclinic=_system_triclinic(system)).add_density_profile(
        group, axis=axis, n_bins=n_bins, mode="charge", name="rho")
    runner = pipe.runner(group=None, ship="all")
    out = runner.run(trajectory, batch_size=batch_size)
    rho = np.asarray(out["rho"], np.float64)              # [F, n_bins]
    from ..parallel.engine import DeviceTrajectory

    if isinstance(trajectory, DeviceTrajectory):
        boxes = np.asarray(trajectory.boxes, np.float64)
        if boxes.ndim == 3:
            if ax != 2:
                raise ParallelError(
                    "potential_profile on a triclinic box supports "
                    "axis='z' only (only the c vector has a z component "
                    "in the Gromacs convention)")
            lz = boxes[:, ax, ax]
        else:
            lz = boxes[:, ax]
    else:
        from ..io.traj import open_source

        src = open_source(trajectory)
        b = src.read_batch(np.arange(src.n_frames())).box_matrices()
        lz = np.asarray([b[f][ax, ax] for f in range(b.shape[0])],
                        np.float64)
    if rho.shape[0] != lz.shape[0]:
        raise ParallelError("frame count mismatch between profile and box")

    dz = lz / n_bins                                      # [F]
    # E_k = (e/eps0) * sum_{i<=k} rho_i * dz   (V/nm)
    csum = np.cumsum(rho, axis=1)
    field = _E_OVER_EPS0_NM * csum * dz[:, None]
    # psi_k = -sum_{i<=k} E_i * dz   (V)
    psi = -np.cumsum(field, axis=1) * dz[:, None]
    centers = (np.arange(n_bins) + 0.5) / n_bins * lz.mean()
    return {"centers": centers, "rho": rho.mean(0),
            "field": field.mean(0), "psi": psi.mean(0)}

def order_parameters(system, trajectory, group: str, *, axis="z",
                     batch_size: int = 32):
    """Trajectory-averaged bond orientational order parameters of a
    selection (surpass — `gmx order` / gorder semantics; see
    `TrajectoryAnalysis.add_order` for the per-frame form and the
    hydrogen-detection rules).

    Runs one batched pass over `trajectory` (a filename) and averages
    S = (3 cos^2 theta - 1)/2 over frames, then over each heavy atom's
    bonds.  Returns a dict:

    - 'heavy' [M]: global indices of heavy atoms with >= 1 hydrogen bond
    - 's' [M]: per-heavy-atom mean S (lipid conventions report -s)
    - 'pairs' ([P], [P]): (heavy, hydrogen) global indices per bond
    - 's_pairs' [P]: per-bond trajectory mean S
    """
    pipe = TrajectoryAnalysis(
        system, triclinic=_system_triclinic(system)
    ).add_order(group, axis=axis,
                                                name="order")
    out = pipe.run(trajectory, batch_size=batch_size)
    c_idx, h_idx = pipe.order_pairs["order"]
    s_pairs = np.asarray(out["order"], np.float64).mean(axis=0)
    heavy, inv = np.unique(c_idx, return_inverse=True)
    sums = np.zeros(heavy.shape[0], np.float64)
    counts = np.zeros(heavy.shape[0], np.int64)
    np.add.at(sums, inv, s_pairs)
    np.add.at(counts, inv, 1)
    return {"heavy": heavy, "s": sums / counts,
            "pairs": (c_idx, h_idx), "s_pairs": s_pairs}

def densmap(system, trajectory, group: str = "all", *, axes: str = "xy",
            bins=(100, 100), weights: str = "number",
            batch_size: int = 32):
    """2D partial-density map averaged over a trajectory (surpass — the
    `gmx densmap` workload; absent from the reference).

    The box is divided into `bins` fractional tiles along the two `axes`
    ("xy"/"xz"/"yz"); each frame scatter-adds its atoms' weights
    ("number", "mass", or "charge") into the grid, scaled by that
    frame's bin volume (box volume / nx / ny — exact under NPT box
    fluctuation), in ONE jitted dispatch for the whole pass.

    Returns a dict: 'map' — a `GridMap` (tile centers in nm of the MEAN
    box) holding the time-averaged density (nm^-3, weight units per
    nm^3), 'counts' [nx, ny] raw weighted counts, 'x'/'y' bin centers,
    'mean_box' [3].
    """
    import jax
    import jax.numpy as jnp

    from ..core.gridmap import GridMap

    if len(axes) != 2 or axes[0] not in _AXIS or axes[1] not in _AXIS \
            or axes[0] == axes[1]:
        raise ParallelError(f"axes must be two distinct of 'xyz', got "
                            f"'{axes}'")
    i1, i2 = _AXIS[axes[0]], _AXIS[axes[1]]
    nx, ny = int(bins[0]), int(bins[1])

    gsel, pos, boxes, _ = _resident_group_pos(
        system, trajectory, group, batch_size)

    if weights == "number":
        w = np.ones(gsel.shape[0], np.float32)
    elif weights == "mass":
        w = np.asarray(system.topology.mass, np.float32)[gsel]
    elif weights == "charge":
        w = np.asarray(system.topology.charge, np.float32)[gsel]
    else:
        raise ParallelError(
            f"weights must be 'number', 'mass', or 'charge', got "
            f"'{weights}'")
    f, k = int(pos.shape[0]), int(pos.shape[1])

    @jax.jit
    def _hist(pos, boxes, w):
        if boxes.ndim == 3:
            # fractional coordinates along the box VECTORS (exact tiles
            # for sheared cells); volume from the determinant
            hinv = jnp.linalg.inv(boxes)
            frac = jnp.einsum("fki,fij->fkj", pos, hinv,
                              precision=jax.lax.Precision.HIGHEST)
            vol = jnp.abs(jnp.linalg.det(boxes))           # [F]
        else:
            frac = pos / boxes[:, None, :]
            vol = jnp.prod(boxes, axis=1)                  # [F]
        frac = frac - jnp.floor(frac)
        ix = jnp.clip((frac[..., i1] * nx).astype(jnp.int32), 0, nx - 1)
        iy = jnp.clip((frac[..., i2] * ny).astype(jnp.int32), 0, ny - 1)
        flat = (ix * ny + iy).reshape(-1)
        ww = jnp.broadcast_to(w[None, :], (f, k))
        dens_w = (ww * ((nx * ny) / vol)[:, None]).reshape(-1)
        counts = jnp.zeros((nx * ny,), jnp.float32).at[flat].add(
            ww.reshape(-1))
        dens = jnp.zeros((nx * ny,), jnp.float32).at[flat].add(dens_w)
        return counts.reshape(nx, ny), dens.reshape(nx, ny) / f

    counts, dens = _hist(pos, boxes, jnp.asarray(w))
    counts = np.asarray(counts, np.float64)
    dens = np.asarray(dens, np.float64)
    bx = np.asarray(boxes, np.float64)
    # bin centers in nm of the MEAN box: along the box-vector NORMS for
    # triclinic cells (the tiles are fractional along a/b/c)
    mean_box = (np.linalg.norm(bx, axis=-1).mean(axis=0) if bx.ndim == 3
                else bx.mean(axis=0))
    bwx = mean_box[i1] / nx
    bwy = mean_box[i2] / ny
    xs = (np.arange(nx) + 0.5) * bwx
    ys = (np.arange(ny) + 0.5) * bwy
    gm = GridMap.from_vec((xs[0], xs[-1]), (ys[0], ys[-1]), (bwx, bwy),
                          dens.reshape(-1), data_order="row")
    return {"map": gm, "density": dens, "counts": counts, "x": xs, "y": ys,
            "mean_box": mean_box}

def _water_sites(system, oxygen: str, hydrogens: str):
    """Resolve water-like sites: each oxygen matched to exactly two
    hydrogen atoms of the same residue.  Returns (o_idx [W],
    h_idx [W, 2]) global indices."""
    o = _sel_indices(system, oxygen)
    h = _sel_indices(system, hydrogens)
    if o.size == 0:
        raise GroupError(f"oxygen selection '{oxygen}' is empty",
                         code="EmptyGroup")
    res = np.asarray(system.topology.resnum)
    by_res = {}
    for idx in h:
        by_res.setdefault(int(res[idx]), []).append(int(idx))
    h2 = np.empty((o.size, 2), np.int64)
    for i, oi in enumerate(o):
        hs = by_res.get(int(res[oi]), [])
        if len(hs) != 2:
            raise GroupError(
                f"oxygen atom {int(oi)} (residue {int(res[oi])}) has "
                f"{len(hs)} matching hydrogens, need exactly 2",
                code="InvalidWater")
        h2[i] = hs
    return o, h2

def sorient(system, trajectory, ref_group: str, *,
            oxygen: str = "name OW", hydrogens: str = "name HW1 HW2",
            rmin: float = 0.0, rmax: float = 0.5, bins: int = 40,
            batch_size: int = 32):
    """Solvent orientation around a reference group (surpass — the
    `gmx sorient` workload; absent from the reference).

    For every water whose oxygen lies within (rmin, rmax] of the
    reference COM (refined Bai-Breen, min-image): theta1 is the angle
    between the water dipole bisector and the OUTWARD vector (COM ->
    oxygen); theta2 the angle between each O-H bond and the same
    outward vector.  All frames evaluate in one jitted dispatch.

    Returns a dict: 'cos1_hist'/'cos2_hist' [bins] over cos in [-1, 1]
    (probability densities), 'cos1_edges', 'mean_cos1'/'mean_cos2',
    'n_selected' (total water-frames in the shell), 'r_bins' [bins],
    'mean_cos1_r' [bins] (shell-resolved mean cos theta1 over
    (0, rmax], NaN where empty).
    """
    import jax
    import jax.numpy as jnp

    o_idx, h_idx = _water_sites(system, oxygen, hydrogens)
    union = "__sorient_union"
    system.group_create_from_indices(
        union, np.union1d(np.union1d(o_idx, h_idx.ravel()),
                          np.asarray(system.group_indices(ref_group))))
    try:
        gsel, pos, boxes, _ = _resident_group_pos(
            system, trajectory, union, batch_size)
    finally:
        system.group_remove(union)
    lut = np.full(system.topology.n_atoms, -1, np.int64)
    lut[gsel] = np.arange(gsel.size)
    o_l = jnp.asarray(lut[o_idx])
    h_l = jnp.asarray(lut[h_idx])
    ref_l = jnp.asarray(lut[np.asarray(system.group_indices(ref_group))])
    w_ref = jnp.asarray(np.asarray(system.topology.mass, np.float32)[
        np.asarray(system.group_indices(ref_group))])

    f = int(pos.shape[0])
    nb = int(bins)

    @jax.jit
    def _orient(pos, boxes):
        def one_frame(args):
            pf, box = args
            com = _ctr(pf[ref_l], box, w=w_ref)
            po = pf[o_l]                                  # [W, 3]
            out_v = _mi(po - com[None, :], box)
            r = jnp.sqrt(jnp.sum(out_v * out_v, axis=-1))
            ou = out_v / jnp.maximum(r, 1e-12)[:, None]
            b1 = _mi(pf[h_l[:, 0]] - po, box)
            b2 = _mi(pf[h_l[:, 1]] - po, box)
            dip = b1 + b2
            dip = dip / jnp.maximum(
                jnp.sqrt(jnp.sum(dip * dip, axis=-1)), 1e-12)[:, None]
            c1 = jnp.sum(dip * ou, axis=-1)               # [W]
            c2a = jnp.sum(b1 * ou, axis=-1) / jnp.maximum(
                jnp.sqrt(jnp.sum(b1 * b1, axis=-1)), 1e-12)
            c2b = jnp.sum(b2 * ou, axis=-1) / jnp.maximum(
                jnp.sqrt(jnp.sum(b2 * b2, axis=-1)), 1e-12)
            sel = ((r > rmin) & (r <= rmax)).astype(jnp.float32)

            def hist(c, w):
                i = jnp.clip(((c + 1.0) * (nb / 2.0)).astype(jnp.int32),
                             0, nb - 1)
                return jnp.zeros((nb,), jnp.float32).at[i].add(w)

            h1 = hist(c1, sel)
            h2 = hist(c2a, sel) + hist(c2b, sel)
            s1 = jnp.sum(c1 * sel)
            s2 = jnp.sum((c2a + c2b) * sel)
            n = jnp.sum(sel)
            # shell-resolved mean cos1 over (0, rmax]
            ri = jnp.clip((r * (nb / rmax)).astype(jnp.int32), 0, nb - 1)
            inr = (r <= rmax).astype(jnp.float32)
            rs = jnp.zeros((nb,), jnp.float32).at[ri].add(c1 * inr)
            rn = jnp.zeros((nb,), jnp.float32).at[ri].add(inr)
            return h1, h2, s1, s2, n, rs, rn

        return jax.lax.map(one_frame, (pos, boxes))

    h1, h2, s1, s2, n, rs, rn = (np.asarray(x, np.float64).sum(axis=0)
                                 for x in _orient(pos, boxes))
    n = float(n)
    dc = 2.0 / nb
    edges = np.linspace(-1.0, 1.0, nb + 1)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = {
            "cos1_hist": h1 / max(n, 1.0) / dc,
            "cos2_hist": h2 / max(2.0 * n, 1.0) / dc,
            "cos1_edges": edges,
            "mean_cos1": s1 / n if n else np.nan,
            "mean_cos2": s2 / (2 * n) if n else np.nan,
            "n_selected": n,
            "r_bins": (np.arange(nb) + 0.5) * (rmax / nb),
            "mean_cos1_r": np.where(rn > 0, rs / np.maximum(rn, 1), np.nan),
        }
    return out

def h2order(system, trajectory, *, oxygen: str = "name OW",
            hydrogens: str = "name HW1 HW2", axis: str = "z",
            bins: int = 50, batch_size: int = 32):
    """Water dipole orientation per slab along a box axis (surpass —
    the `gmx h2order` workload; absent from the reference).

    Slabs are fractional along `axis` (NPT-exact); per water the cosine
    between its dipole bisector and the +axis direction accumulates
    into its oxygen's slab.  One jitted dispatch for the whole pass.

    Returns a dict: 'z' [bins] slab centers (nm, mean box),
    'cos' [bins] mean cos(dipole, axis) (NaN where empty),
    'count' [bins] water-frames per slab.
    """
    import jax
    import jax.numpy as jnp

    if axis not in _AXIS:
        raise ParallelError(f"axis must be one of xyz, got '{axis}'")
    ax = _AXIS[axis]
    o_idx, h_idx = _water_sites(system, oxygen, hydrogens)
    union = "__h2order_union"
    system.group_create_from_indices(
        union, np.union1d(o_idx, h_idx.ravel()))
    try:
        gsel, pos, boxes, _ = _resident_group_pos(
            system, trajectory, union, batch_size)
    finally:
        system.group_remove(union)
    lut = np.full(system.topology.n_atoms, -1, np.int64)
    lut[gsel] = np.arange(gsel.size)
    o_l = jnp.asarray(lut[o_idx])
    h_l = jnp.asarray(lut[h_idx])
    nb = int(bins)
    if np.asarray(boxes).ndim == 3 and ax != 2:
        # Gromacs lower-triangular H: only the c row has a z component,
        # so only axis='z' has a scalar period under a sheared cell
        raise ParallelError(
            "h2order on a triclinic box supports axis='z' only")

    @jax.jit
    def _slabs(pos, boxes):
        def one_frame(args):
            pf, box = args
            po = pf[o_l]
            b1 = _mi(pf[h_l[:, 0]] - po, box)
            b2 = _mi(pf[h_l[:, 1]] - po, box)
            dip = b1 + b2
            c = dip[:, ax] / jnp.maximum(
                jnp.sqrt(jnp.sum(dip * dip, axis=-1)), 1e-12)
            period = box[ax, ax] if box.ndim == 2 else box[ax]
            zf = po[:, ax] / period
            zf = zf - jnp.floor(zf)
            i = jnp.clip((zf * nb).astype(jnp.int32), 0, nb - 1)
            cs = jnp.zeros((nb,), jnp.float32).at[i].add(c)
            cn = jnp.zeros((nb,), jnp.float32).at[i].add(1.0)
            return cs, cn

        return jax.lax.map(one_frame, (pos, boxes))

    cs, cn = (np.asarray(x, np.float64).sum(axis=0)
              for x in _slabs(pos, boxes))
    bx = np.asarray(boxes, np.float64)
    period = (bx[:, ax, ax] if bx.ndim == 3 else bx[:, ax]).mean()
    z = (np.arange(nb) + 0.5) * (period / nb)
    with np.errstate(invalid="ignore", divide="ignore"):
        cosm = np.where(cn > 0, cs / np.maximum(cn, 1), np.nan)
    return {"z": z, "cos": cosm, "count": cn}

def spol(system, trajectory, ref_group: str, solvent: str, *,
         rmax: float = 1.0, bins: int = 50, batch_size: int = 32):
    """Solvent dipole orientation vs distance to a solute (surpass —
    the `gmx spol` workload; absent from the reference).

    Solvent molecules are the residues of `solvent` (charges + masses
    required).  Per frame and molecule, rebuilt whole by minimum image
    around its first atom: the molecular dipole about the molecule's
    own COM (origin-independent for any net charge) and the min-image
    vector from the `ref_group` mass-weighted center to that COM.
    cos(theta) between them is averaged into `bins` shells of the
    COM-COM distance over (0, rmax].  One jitted dispatch for all
    frames.

    Returns a dict: 'r_bins' [bins] shell centers, 'mean_cos_r' [bins]
    (NaN where empty), 'counts' [bins], 'mean_cos', 'n_selected'.
    """
    import jax
    import jax.numpy as jnp

    ridx = _transient_indices(system, ref_group)
    sidx = _transient_indices(system, solvent)
    for nm, ix in (("ref_group", ridx), ("solvent", sidx)):
        if ix.size == 0:
            raise GroupError(f"{nm} is empty", code="EmptyGroup")
    topo = system.topology
    if not topo.has_charge[sidx].all():
        raise GroupError("solvent has atoms without charge",
                         code="InvalidCharge")

    union = np.unique(np.concatenate([ridx, sidx]))
    name = "__spol_union"
    system.group_create_from_indices(name, union)
    try:
        gsel, pos, boxes, _ = _resident_group_pos(
            system, trajectory, name, batch_size)
    finally:
        system.group_remove(name)

    _, _, blocks = _residue_blocks(system, sidx)
    loc = np.searchsorted(gsel, sidx)
    cols, w, qt, _ = _unit_tables(system, sidx, blocks, loc, charges=True)
    cols_j, w_j, qt_j = (jnp.asarray(cols), jnp.asarray(w),
                         jnp.asarray(qt))
    ref_l = jnp.asarray(np.searchsorted(gsel, ridx))
    from ..system.rmsd import _masses

    w_ref = jnp.asarray(np.asarray(
        _masses(system, "spol ref", ridx), np.float32))
    nb = int(bins)

    @jax.jit
    def _spol(pos, boxes):
        def one_frame(args):
            pf, box = args
            ref_com = _ctr(pf[ref_l], box, w=w_ref)
            x = pf[cols_j]                              # [U, P, 3]
            rel = _mi(x - x[:, :1], box)                # whole units
            com_rel = jnp.sum(w_j[..., None] * rel, axis=1)   # [U, 3]
            com = x[:, 0] + com_rel
            # dipole about the unit COM: exact for any net charge
            dip = jnp.sum(qt_j[..., None] * (rel - com_rel[:, None, :]),
                          axis=1)                       # [U, 3]
            rv = _mi(com - ref_com[None, :], box)
            r = jnp.sqrt(jnp.sum(rv * rv, axis=-1))
            c = jnp.sum(dip * rv, axis=-1) / jnp.maximum(
                r * jnp.sqrt(jnp.sum(dip * dip, axis=-1)), 1e-12)
            sel = ((r > 0) & (r <= rmax)).astype(jnp.float32)
            ri = jnp.clip((r * (nb / rmax)).astype(jnp.int32), 0, nb - 1)
            cs = jnp.zeros((nb,), jnp.float32).at[ri].add(c * sel)
            cn = jnp.zeros((nb,), jnp.float32).at[ri].add(sel)
            return cs, cn

        return jax.lax.map(one_frame, (pos, boxes))

    cs, cn = (np.asarray(x, np.float64).sum(axis=0)
              for x in _spol(pos, boxes))
    n = float(cn.sum())
    with np.errstate(invalid="ignore", divide="ignore"):
        return {
            "r_bins": (np.arange(nb) + 0.5) * (rmax / nb),
            "mean_cos_r": np.where(cn > 0, cs / np.maximum(cn, 1), np.nan),
            "counts": cn,
            "mean_cos": cs.sum() / n if n else np.nan,
            "n_selected": n,
        }

def hydorder(system, trajectory, oxygen: str = "name OW", *,
             axis: str = "z", slabs: int = 0, batch_size: int = 32,
             chunk: int = 256):
    """Tetrahedrality order parameters per water oxygen (surpass — the
    `gmx hydorder` workload; absent from the reference).

    For each atom of `oxygen` and frame, its 4 nearest minimum-image
    neighbours within the selection define (Errington & Debenedetti,
    Nature 409:318):
      angle order  S_g = 1 - 3/8 * sum_{j<k} (cos psi_jk + 1/3)^2
      distance order S_k = 1 - 1/3 * sum_k (r_k - rbar)^2 / (4 rbar^2)
    evaluated as chunked dense distance tiles + `top_k` on device.
    With `slabs` > 0, atoms bin into fractional slabs along `axis` and
    per-slab means are returned (the interface-profile use).

    Returns a dict: 'sg'/'sk' [F, W], 'mean_sg'/'mean_sk' [F], and with
    slabs: 'slab_sg'/'slab_sk' [slabs] pass means (NaN where empty),
    'slab_counts' [slabs].
    """
    import jax
    import jax.numpy as jnp

    oidx = _transient_indices(system, oxygen)
    if oidx.size < 5:
        raise GroupError(
            f"need at least 5 atoms for 4-neighbour order parameters, "
            f"selection '{oxygen}' has {oidx.size}", code="EmptyGroup")
    name = "__hydorder_sel"
    system.group_create_from_indices(name, oidx)
    try:
        gsel, pos, boxes, _ = _resident_group_pos(
            system, trajectory, name, batch_size)
    finally:
        system.group_remove(name)

    wn = int(gsel.size)
    ax = {"x": 0, "y": 1, "z": 2}[axis]
    n_chunks = -(-wn // chunk)
    padn = n_chunks * chunk - wn
    starts = jnp.arange(n_chunks) * chunk
    big = jnp.float32(1e30)

    @jax.jit
    def _order(pos, boxes):
        def one_frame(args):
            pf, box = args
            if padn:
                pfp = jnp.concatenate(
                    [pf, jnp.full((padn, 3), 1e5, jnp.float32)])
            else:
                pfp = pf

            def block(c0):
                pc = jax.lax.dynamic_slice_in_dim(pfp, c0, chunk)
                d = _mi(
                    pc[:, None, :] - pf[None, :, :], box)   # [C, W, 3]
                d2 = jnp.sum(d * d, axis=-1)
                row = jnp.arange(chunk) + c0
                d2 = jnp.where(row[:, None] == jnp.arange(wn)[None, :],
                               big, d2)
                nd2, ni = jax.lax.top_k(-d2, 4)              # [C, 4]
                r = jnp.sqrt(jnp.maximum(-nd2, 0.0))
                v = jnp.take_along_axis(
                    d, ni[..., None], axis=1)                # [C, 4, 3]
                u = v / jnp.maximum(r, 1e-12)[..., None]
                cs = jnp.einsum("cjd,ckd->cjk", u, u)
                iu, ju = jnp.triu_indices(4, k=1)
                sg = 1.0 - (3.0 / 8.0) * jnp.sum(
                    (cs[:, iu, ju] + 1.0 / 3.0) ** 2, axis=1)
                rbar = jnp.mean(r, axis=1)
                sk = 1.0 - jnp.sum((r - rbar[:, None]) ** 2, axis=1) / (
                    3.0 * 4.0 * jnp.maximum(rbar, 1e-12) ** 2)
                return sg, sk

            sg, sk = jax.lax.map(block, starts)
            return sg.reshape(-1)[:wn], sk.reshape(-1)[:wn]

        return jax.lax.map(one_frame, (pos, boxes))

    sg, sk = (np.asarray(x, np.float64) for x in _order(pos, boxes))
    out = {"sg": sg, "sk": sk,
           "mean_sg": sg.mean(axis=1), "mean_sk": sk.mean(axis=1)}
    if slabs:
        bx = np.asarray(boxes)
        if bx.ndim == 3 and ax != 2:
            raise ParallelError(
                "hydorder slabs on a triclinic box support axis='z' only")
        period = bx[:, ax, ax] if bx.ndim == 3 else bx[:, ax]
        frac = np.asarray(pos)[:, :, ax] / period[:, None]
        si = np.clip((np.mod(frac, 1.0) * slabs).astype(np.int64),
                     0, slabs - 1)
        cnt = np.zeros(slabs)
        ssg = np.zeros(slabs)
        ssk = np.zeros(slabs)
        np.add.at(cnt, si.ravel(), 1.0)
        np.add.at(ssg, si.ravel(), sg.ravel())
        np.add.at(ssk, si.ravel(), sk.ravel())
        with np.errstate(invalid="ignore", divide="ignore"):
            out["slab_sg"] = np.where(cnt > 0, ssg / np.maximum(cnt, 1),
                                      np.nan)
            out["slab_sk"] = np.where(cnt > 0, ssk / np.maximum(cnt, 1),
                                      np.nan)
        out["slab_counts"] = cnt.astype(np.int64)
    return out

def densorder(system, trajectory, group: str = "all", *, axis: str = "z",
              bins: int = 100, mode: str = "mass", threshold: float = 0.5,
              batch_size: int = 32):
    """Liquid-slab interface positions from per-frame density profiles
    (surpass — the `gmx densorder` workload; absent from the
    reference).

    Per frame: the `group` density profile along `axis`
    (`add_density_profile`, NPT-exact fractional slabs), then the two
    positions where it crosses `threshold` x its own maximum — linear
    interpolation between adjacent slab centers, scanning inward from
    each box edge (gmx densorder's bulk/interface split).  Positions
    are reported in nm using the per-frame box length (`add_box_length`
    rides the same device pass).

    Returns a dict: 'lower'/'upper' [F] nm interface positions,
    'thickness' [F] nm, 'lower_sigma'/'upper_sigma' (std of each
    interface over the pass — the fluctuation gmx densorder fits
    capillary-wave spectra to), 'profiles' [F, bins], 'box_len' [F].
    """
    ax = {"x": 0, "y": 1, "z": 2}.get(axis)
    if ax is None:
        raise GroupError(f"unknown axis '{axis}' (use 'x'|'y'|'z')",
                         code="InvalidAxis")
    with _named_group(system, group, "__densorder_sel") as g:
        pipe = (TrajectoryAnalysis(system,
                                   triclinic=_system_triclinic(system))
                .add_density_profile(g, axis=axis, n_bins=bins, mode=mode,
                                     name="prof")
                .add_box_lengths(name="blen"))
        out = pipe.runner(group=None, ship="all").run(
            trajectory, batch_size=batch_size)
    prof = np.asarray(out["prof"], np.float64)          # [F, bins]
    box_len = np.asarray(out["blen"], np.float64)[:, ax]  # NPT-exact

    f = prof.shape[0]
    centers = (np.arange(bins) + 0.5) / bins
    lower = np.full(f, np.nan)
    upper = np.full(f, np.nan)
    for i in range(f):
        p = prof[i]
        lvl = float(threshold) * p.max()
        if p.max() <= 0:
            continue
        above = p >= lvl
        if not above.any():
            continue
        j0 = int(np.argmax(above))                     # first slab >= lvl
        j1 = bins - 1 - int(np.argmax(above[::-1]))    # last slab >= lvl
        if j0 > 0:
            a, b = p[j0 - 1], p[j0]
            frac = centers[j0 - 1] + (lvl - a) / (b - a) / bins
        else:
            frac = centers[0]
        lower[i] = frac * box_len[i]
        if j1 < bins - 1:
            a, b = p[j1], p[j1 + 1]
            frac = centers[j1] + (a - lvl) / (a - b) / bins
        else:
            frac = centers[-1]
        upper[i] = frac * box_len[i]
    return {"lower": lower, "upper": upper,
            "thickness": upper - lower,
            "lower_sigma": float(np.nanstd(lower)),
            "upper_sigma": float(np.nanstd(upper)),
            "profiles": prof, "box_len": box_len}
