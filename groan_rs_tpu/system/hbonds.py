"""Hydrogen-bond detection (reference: `src/system/hbonds.rs`).

TPU-native re-design: the reference builds a cell grid per chain and walks
donor -> neighbor-acceptor pairs atom-by-atom (hbonds.rs:160-298).  Here a
chain pair evaluates as one vectorized kernel over the
`(hydrogen, acceptor)` pair grid: minimum-image D-A distances, D-H-A
angles (`calc_angle` semantics incl. the NaN 0/180-degree disambiguation,
hbonds.rs:302-338), and both criteria applied as masks.  Per-frame results
come back as index arrays.

Geometric criteria match the reference exactly:
- keep when D-A distance <= max_distance (reference skips `> max_distance`)
- keep when D-H-A angle >= min_angle (reference skips `< min_angle`)
- the acceptor must not be the donor itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import GroupError, HBondError, SelectError


@dataclass
class HBondChain:
    """GSL queries selecting a chain's acceptors/donors/hydrogens
    (reference: hbonds.rs:24)."""

    acceptors: str
    donors: str
    hydrogens: str


@dataclass
class HBond:
    """reference: hbonds.rs:52."""

    donor: int
    hydrogen: int
    acceptor: int
    distance: float
    angle: float


class _ChainGroups:
    """Resolved chain: acceptor indices + (donor, hydrogen) pairs
    (reference: HBondChainGroups, hbonds.rs:93-144)."""

    def __init__(self, system, chain: HBondChain):
        from ..select import parse_query
        from ..select.compile import evaluate_mask

        try:
            acc = np.nonzero(evaluate_mask(parse_query(chain.acceptors), system))[0]
            don = np.nonzero(evaluate_mask(parse_query(chain.donors), system))[0]
            hyd_mask = evaluate_mask(parse_query(chain.hydrogens), system)
        except SelectError as e:
            raise HBondError(str(e), code="SelectError") from e

        pairs = []  # (hydrogen_index, donor_index)
        bonded = system.topology.bonded
        for d in don:
            hs = [h for h in bonded[d] if hyd_mask[h]]
            for h in hs:
                pairs.append((h, int(d)))
        self.acceptors = acc.astype(np.int64)
        self.hd_pairs = np.asarray(pairs, np.int64).reshape(-1, 2)
        if acc.shape[0] == 0 and self.hd_pairs.shape[0] == 0:
            raise HBondError("chain selects no acceptors and no donors", code="EmptyChain")


def _sanity_check_pairs(pairs, n_chains):
    """reference: hbonds.rs sanity_check_pairs."""
    seen = set()
    used = set()
    for c1, c2 in pairs:
        for c in (c1, c2):
            if c >= n_chains or c < 0:
                raise HBondError(f"chain {c} does not exist", code="NonexistentChain")
        key = (min(c1, c2), max(c1, c2))
        if key in seen:
            raise HBondError(
                f"pair ({c1}, {c2}) specified multiple times", code="PairSpecifiedMultipleTimes"
            )
        seen.add(key)
        used.update((c1, c2))
    if len(used) != n_chains:
        raise HBondError("some chain is not used by any pair", code="UnusedChain")


_CHUNK = 1024  # hydrogen-pair tile size (keeps the [chunk, A] grid in cache)


def _pair_kernel(dp, hp, ap, box, d_idx, acc_idx):
    """Jitted tile: D-A distances + D-H-A angles for a hydrogen chunk.

    dp/hp: [C, 3]; ap: [A, 3]; returns (dist [C, A], angle [C, A], valid).
    """
    import jax.numpy as jnp

    from ..ops import pbc

    dvec = pbc.min_image(dp[:, None, :] - ap[None, :, :], box)
    dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1))

    hd = pbc.vector_to(hp, dp, box)  # [C, 3] hydrogen->donor
    ha = pbc.vector_to(hp[:, None, :], ap[None, :, :], box)  # [C, A, 3]
    num = jnp.sum(hd[:, None, :] * ha, axis=-1)
    den = jnp.linalg.norm(hd, axis=-1)[:, None] * jnp.linalg.norm(ha, axis=-1)
    cosang = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), jnp.nan)
    angle = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    # NaN disambiguation (reference: handle_nan, hbonds.rs:321-338)
    hvec = pbc.min_image(hp[:, None, :] - ap[None, :, :], box)
    h_dist = jnp.sqrt(jnp.sum(hvec * hvec, axis=-1))
    angle = jnp.where(jnp.isnan(angle), jnp.where(h_dist < dist, 180.0, 0.0), angle)

    valid = d_idx[:, None] != acc_idx[None, :]
    return dist, angle, valid


_jit_pair_kernel = None


def _detect(positions, box, acceptors, hd_pairs, max_distance, min_angle):
    """Chunked vectorized detection for one (donor-set, acceptor-set)
    direction.  Returns a list of HBond.  positions: [N, 3], box: (3,)."""
    global _jit_pair_kernel
    if _jit_pair_kernel is None:
        import jax

        _jit_pair_kernel = jax.jit(_pair_kernel)

    if acceptors.shape[0] == 0 or hd_pairs.shape[0] == 0:
        return []

    ap = positions[acceptors].astype(np.float32)
    acc_idx = acceptors
    out = []
    n_pairs = hd_pairs.shape[0]
    for start in range(0, n_pairs, _CHUNK):
        chunk = hd_pairs[start : start + _CHUNK]
        c = chunk.shape[0]
        if c < _CHUNK:  # pad to the static tile shape
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], _CHUNK - c, axis=0)])
        h_idx = chunk[:, 0]
        d_idx = chunk[:, 1]
        dist, angle, valid = _jit_pair_kernel(
            positions[d_idx].astype(np.float32),
            positions[h_idx].astype(np.float32),
            ap, box.astype(np.float32), d_idx, acc_idx,
        )
        dist = np.asarray(dist)
        angle = np.asarray(angle)
        ok = np.asarray(valid) & (dist <= max_distance) & (angle >= min_angle)
        ok[c:] = False
        pi, ai = np.nonzero(ok)
        for p, a in zip(pi, ai):
            out.append(
                HBond(
                    donor=int(d_idx[p]),
                    hydrogen=int(h_idx[p]),
                    acceptor=int(acc_idx[a]),
                    distance=float(dist[p, a]),
                    angle=float(angle[p, a]),
                )
            )
    return out


class HBondAnalysis:
    """Per-frame hydrogen-bond analyzer (reference: hbonds.rs:86)."""

    def __init__(self, system, chains, pairs, max_distance: float, min_angle: float):
        self.chains = [_ChainGroups(system, c) for c in chains]
        _sanity_check_pairs(pairs, len(self.chains))
        self.pairs = list(pairs)
        self.max_distance = float(max_distance)
        self.min_angle = float(min_angle)

    def analyze(self, system) -> dict:
        """-> HBondMap: {(chain1, chain2): [HBond, ...]}."""
        from ..core.simbox import simbox_check

        box = simbox_check(system.get_box()).to_lengths_vec()
        pos = system.positions
        out = {}
        for c1, c2 in self.pairs:
            if c1 == c2:
                bonds = _detect(pos, box, self.chains[c1].acceptors,
                                self.chains[c1].hd_pairs, self.max_distance, self.min_angle)
            else:
                bonds = _detect(pos, box, self.chains[c1].acceptors,
                                self.chains[c2].hd_pairs, self.max_distance, self.min_angle)
                bonds += _detect(pos, box, self.chains[c2].acceptors,
                                 self.chains[c1].hd_pairs, self.max_distance, self.min_angle)
            out[(c1, c2)] = bonds
        return out


class HBondsMixin:
    def hbonds_analyze_frame(self, chains, pairs, max_distance: float = 0.35,
                             min_angle: float = 120.0) -> dict:
        """Detect hydrogen bonds in the current frame."""
        analysis = HBondAnalysis(self, chains, pairs, max_distance, min_angle)
        return analysis.analyze(self)

    def hbonds_analyze(self, trajectory, chains, pairs, max_distance: float = 0.35,
                       min_angle: float = 120.0, **traj_kw):
        """Iterate a trajectory yielding (system, HBondMap) per frame
        (reference: HBondTrajRead::hbonds_analyze, hbonds.rs:457)."""
        analysis = HBondAnalysis(self, chains, pairs, max_distance, min_angle)
        from ..io.traj import traj_iter

        for frame in traj_iter(self, trajectory, **traj_kw):
            yield frame, analysis.analyze(frame)
