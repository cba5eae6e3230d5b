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

__all__ = ["hbond_energy", "assign_3state", "KS_CUTOFF"]

KS_CUTOFF = -0.5          # kcal/mol
_Q1Q2F = 0.084 * 332.0    # Kabsch-Sander electrostatic factor


def hbond_energy(n, ca, c, o, boxes, donor_ok):
    """Backbone H-bond energy matrix per frame.

    n/ca/c/o: `[F, R, 3]` backbone coordinates in nm; boxes `[F, 3]`
    (orthorhombic minimum image — frames may be PBC-wrapped);
    donor_ok: `[R]` bool (False for prolines and residues with no
    predecessor).  Returns `[F, R, R]` energies in kcal/mol where
    `e[f, j, i]` is donor NH(j) -> acceptor CO(i); invalid donors and
    |i-j| < 1 pairs hold +inf.
    """
    import jax.numpy as jnp

    from .pbc import min_image

    n = jnp.asarray(n, jnp.float32)
    ca = jnp.asarray(ca, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    o = jnp.asarray(o, jnp.float32)
    boxes = jnp.asarray(boxes, jnp.float32)
    r = n.shape[1]

    # estimated amide H: needs C(i-1), O(i-1); min-image local vectors
    nc = min_image(n[:, 1:] - c[:, :-1], boxes[:, None, :])
    no = min_image(n[:, 1:] - o[:, :-1], boxes[:, None, :])
    u = nc / jnp.linalg.norm(nc, axis=-1, keepdims=True) \
        + no / jnp.linalg.norm(no, axis=-1, keepdims=True)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    h = jnp.concatenate([n[:, :1], n[:, 1:] + 0.101 * u], axis=1)  # [F,R,3]

    def dist(a, b):
        # [F, R_a, R_b] min-image distances in Angstrom
        d = min_image(a[:, :, None, :] - b[:, None, :, :],
                      boxes[:, None, None, :])
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
