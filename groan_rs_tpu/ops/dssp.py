"""Secondary-structure assignment — Kabsch-Sander on device (surpass.

The reference has no secondary-structure analysis (gmx shells out to an
external dssp binary).  This implements the Kabsch-Sander criteria
(DSSP, Biopolymers 1983) with the widely-used 3-state simplification
(helix / strand / loop, as in pydssp): the backbone hydrogen-bond
energy matrix is computed for every frame as one batched tensor op on
device; the boolean pattern algebra (turns, helices, bridges) is tiny
[F, R] work done vectorized on the host.

Conventions
- E(donor j, acceptor i) = 0.084 * 332 * (1/rON + 1/rCH - 1/rOH - 1/rCN)
  kcal/mol with distances in Angstrom (coords here are nm; converted
  internally); hydrogen bond iff E < -0.5.
- Amide H positions are ESTIMATED from the backbone (pydssp convention):
  H(i) = N(i) + 1.01 A * unit(unit(N(i)-C(i-1)) + unit(N(i)-O(i-1))).
  Residues without a predecessor (chain starts, gaps) and prolines are
  never donors.
- Kabsch-Sander Hbond(i, j) means "CO of residue i accepts from NH of
  residue j"; n-turn(i) = Hbond(i, i+n); minimal helices and the
  parallel/antiparallel bridge definitions follow the paper exactly.
  3-state: H = any minimal 3/4/5-helix span, E = any bridge partner
  (strand overrides helix, as in pydssp), '-' otherwise.
"""

from __future__ import annotations

import numpy as np

__all__ = ["hbond_energy", "assign_3state", "assign_8state", "KS_CUTOFF"]

KS_CUTOFF = -0.5          # kcal/mol
_Q1Q2F = 0.084 * 332.0    # Kabsch-Sander electrostatic factor


def hbond_energy(n, ca, c, o, boxes, donor_ok):
    """Backbone H-bond energy matrix per frame.

    n/ca/c/o: `[F, R, 3]` backbone coordinates in nm; boxes `[F, 3]`
    lengths or `[F, 3, 3]` triclinic matrices (exact minimum image —
    frames may be PBC-wrapped);
    donor_ok: `[R]` bool (False for prolines and residues with no
    predecessor).  Returns `[F, R, R]` energies in kcal/mol where
    `e[f, j, i]` is donor NH(j) -> acceptor CO(i); invalid donors and
    |i-j| < 1 pairs hold +inf.
    """
    import jax.numpy as jnp

    from .pbc import min_image_frames_any

    n = jnp.asarray(n, jnp.float32)
    ca = jnp.asarray(ca, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    o = jnp.asarray(o, jnp.float32)
    boxes = jnp.asarray(boxes, jnp.float32)
    r = n.shape[1]

    # estimated amide H: needs C(i-1), O(i-1); min-image local vectors
    nc = min_image_frames_any(n[:, 1:] - c[:, :-1], boxes)
    no = min_image_frames_any(n[:, 1:] - o[:, :-1], boxes)
    u = nc / jnp.linalg.norm(nc, axis=-1, keepdims=True) \
        + no / jnp.linalg.norm(no, axis=-1, keepdims=True)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    h = jnp.concatenate([n[:, :1], n[:, 1:] + 0.101 * u], axis=1)  # [F,R,3]

    def dist(a, b):
        # [F, R_a, R_b] min-image distances in Angstrom
        d = min_image_frames_any(a[:, :, None, :] - b[:, None, :, :],
                                 boxes)
        return 10.0 * jnp.sqrt(jnp.sum(d * d, axis=-1))

    # donor j (rows: N/H of j), acceptor i (cols: C/O of i)
    r_on = dist(n, o)
    r_ch = dist(h, c)
    r_oh = dist(h, o)
    r_cn = dist(n, c)
    e = _Q1Q2F * (1.0 / r_on + 1.0 / r_ch - 1.0 / r_oh - 1.0 / r_cn)

    jj = jnp.arange(r)
    near = jnp.abs(jj[:, None] - jj[None, :]) < 2        # |i-j| < 2
    bad = near[None] | ~jnp.asarray(donor_ok)[None, :, None]
    return jnp.where(bad, jnp.inf, e)


def assign_3state(energies, consec, cutoff: float = KS_CUTOFF):
    """Kabsch-Sander 3-state assignment from the energy matrices.

    energies: `[F, R, R]` (donor j -> acceptor i, as `hbond_energy`);
    consec: `[R]` bool, consec[i] = residue i+1 exists and directly
    follows residue i (same chain, resnum + 1) — patterns never span
    chain breaks.  Returns `[F, R]` array of 'H' / 'E' / '-'.
    """
    e = np.asarray(energies)
    f, r, _ = e.shape
    consec = np.asarray(consec, bool)
    # ks[f, i, j]: CO(i) accepts from NH(j)
    ks = (e < cutoff).transpose(0, 2, 1)

    # run_ok(n)[i] = all of residues i..i+n are consecutive
    def run_ok(nres):
        out = np.zeros(r, bool)
        for i in range(max(0, r - nres)):
            out[i] = consec[i: i + nres].all()
        return out

    helix = np.zeros((f, r), bool)
    for nres in (3, 4, 5):
        turn = np.zeros((f, r), bool)
        idx = np.arange(max(0, r - nres))
        turn[:, : r - nres] = ks[:, idx, idx + nres] & run_ok(nres)[: r - nres]
        # turns at i and i+1 -> minimal helix on residues i+2 .. i+1+nres
        start = turn[:, :-1] & turn[:, 1:]           # index i (0..r-2)
        for k in range(2, nres + 2):
            helix[:, k:] |= start[:, : r - k]

    # bridges (|i - j| >= 3): parallel / antiparallel
    pad = np.zeros((f, r + 2, r + 2), bool)
    pad[:, 1:-1, 1:-1] = ks
    kp = pad                                          # ks with +-1 margin
    i = np.arange(r)
    far = np.abs(i[:, None] - i[None, :]) >= 3
    # parallel: [Hb(i-1, j) & Hb(j, i+1)] | [Hb(j-1, i) & Hb(i, j+1)]
    p = (kp[:, :-2, 1:-1] & kp[:, 1:-1, 2:].transpose(0, 2, 1)) \
        | (kp[:, :-2, 1:-1].transpose(0, 2, 1) & kp[:, 1:-1, 2:])
    # antiparallel: [Hb(i, j) & Hb(j, i)] | [Hb(i-1, j+1) & Hb(j-1, i+1)]
    a = (ks & ks.transpose(0, 2, 1)) \
        | (kp[:, :-2, 2:] & kp[:, :-2, 2:].transpose(0, 2, 1))
    bridge = (p | a) & far[None]
    strand = bridge.any(axis=2)

    ss = np.full((f, r), "-", dtype="U1")
    ss[helix] = "H"
    ss[strand] = "E"                                   # strand overrides
    return ss


def assign_8state(energies, consec, ca=None, boxes=None,
                  cutoff: float = KS_CUTOFF):
    """Full 8-state DSSP assignment (Kabsch-Sander 1983 structure
    codes) from the energy matrices.

    States and priority (high to low): 'H' 4-helix, 'E' extended
    strand (bridge in a ladder — an adjacent bridge continues it),
    'B' isolated bridge, 'G' 3-10 helix, 'I' pi helix, 'T' n-turn,
    'S' bend (CA curvature > 70 deg; needs `ca` [F, R, 3] nm and
    `boxes` [F, 3]), '-' otherwise.  Minimal-helix spans use the same
    convention as `assign_3state`; beta bulges are not merged into
    ladders (documented simplification).
    """
    e = np.asarray(energies)
    f, r, _ = e.shape
    consec = np.asarray(consec, bool)
    ks = (e < cutoff).transpose(0, 2, 1)      # ks[f, i, j]: CO(i)<-NH(j)

    def run_ok(nres):
        out = np.zeros(r, bool)
        for i in range(max(0, r - nres)):
            out[i] = consec[i: i + nres].all()
        return out

    def minimal_helix(nres):
        turn = np.zeros((f, r), bool)
        idx = np.arange(max(0, r - nres))
        turn[:, : r - nres] = ks[:, idx, idx + nres] & run_ok(nres)[: r - nres]
        start = turn[:, :-1] & turn[:, 1:]
        span = np.zeros((f, r), bool)
        for k in range(2, nres + 2):
            span[:, k:] |= start[:, : r - k]
        return span, turn

    h4, t4 = minimal_helix(4)
    h3, t3 = minimal_helix(3)
    h5, t5 = minimal_helix(5)

    # bridges, split by type for ladder detection
    pad = np.zeros((f, r + 2, r + 2), bool)
    pad[:, 1:-1, 1:-1] = ks
    kp = pad
    i = np.arange(r)
    far = np.abs(i[:, None] - i[None, :]) >= 3
    p = ((kp[:, :-2, 1:-1] & kp[:, 1:-1, 2:].transpose(0, 2, 1))
         | (kp[:, :-2, 1:-1].transpose(0, 2, 1) & kp[:, 1:-1, 2:])) \
        & far[None]
    a = ((ks & ks.transpose(0, 2, 1))
         | (kp[:, :-2, 2:] & kp[:, :-2, 2:].transpose(0, 2, 1))) \
        & far[None]

    def ladder(b, anti):
        """bridge (i, j) extended by an adjacent bridge of its type:
        parallel continues at (i+-1, j+-1), antiparallel at
        (i+-1, j-+1)."""
        bp = np.zeros((f, r + 2, r + 2), bool)
        bp[:, 1:-1, 1:-1] = b
        if anti:
            adj = bp[:, :-2, 2:] | bp[:, 2:, :-2]
        else:
            adj = bp[:, :-2, :-2] | bp[:, 2:, 2:]
        return b & adj

    ext = ladder(p, False) | ladder(a, True)
    strand = ext.any(axis=2)                        # E
    bridge_any = (p | a).any(axis=2)
    isolated = bridge_any & ~strand                 # B

    # T: residues strictly inside any n-turn
    t_mask = np.zeros((f, r), bool)
    for nres, turn in ((3, t3), (4, t4), (5, t5)):
        for k in range(1, nres):
            t_mask[:, k:] |= turn[:, : r - k]

    # S: CA curvature > 70 degrees over i-2 .. i+2
    s_mask = np.zeros((f, r), bool)
    if ca is not None and r >= 5:
        from .pbc import min_image_frames_any as _mi
        import jax.numpy as jnp

        cca = np.asarray(ca, np.float64)
        bx = np.asarray(boxes, np.float64)
        u = np.asarray(_mi(jnp.asarray(cca[:, 2:] - cca[:, :-2]),
                           jnp.asarray(bx)), np.float64)
        # u[f, i] = CA(i+2) - CA(i); kappa at residue i+2 uses
        # (CA(i+2)-CA(i), CA(i+4)-CA(i+2))
        v1 = u[:, :-2]
        v2 = u[:, 2:]
        cosk = np.sum(v1 * v2, axis=-1) / np.maximum(
            np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1),
            1e-12)
        bend = np.degrees(np.arccos(np.clip(cosk, -1, 1))) > 70.0
        ok = np.array([consec[max(0, j - 2): j + 2].all()
                       for j in range(2, r - 2)])
        s_mask[:, 2: r - 2] = bend & ok[None, :]

    ss = np.full((f, r), "-", dtype="U1")
    for mask, code in ((s_mask, "S"), (t_mask, "T"), (h5, "I"),
                       (h3, "G"), (isolated, "B"), (strand, "E"),
                       (h4, "H")):
        ss[mask] = code
    return ss
