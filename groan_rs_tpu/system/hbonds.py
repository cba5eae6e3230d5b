"""Hydrogen-bond detection (reference: `src/system/hbonds.rs`).

Redesign of the reference's donor->neighbor-acceptor walk
(hbonds.rs:160-298): candidates are pruned with the same acceptor cell grid
(cell size = max_distance, `hbonds.rs:163-170`), but generated for ALL
donors at once with vectorized CSR gathers, then scored as flat arrays.

Scoring reproduces the reference's float32 arithmetic exactly, op for op:

- D-A distance: per-axis loop-subtract minimum image (`vector3d.rs:575-592`)
  then `sqrt(dx*dx + dy*dy + dz*dz)` left-fold (`Vector3D::distance`);
  keep when `!(distance > max_distance)`.
- D-H-A angle: `vector_to` = `floor_mod(b - a + L/2, L) - L/2` with Rust's
  truncated `%` (== `np.fmod`), `acos(dot / (len*len)).to_degrees()`
  WITHOUT clamping, so out-of-range cosines go NaN and take the reference's
  `handle_nan` path (H closer to A than D is to A -> 180, else 0;
  hbonds.rs:302-338); keep when `!(angle < min_angle)`.

Bond order matches the reference: donors in chain order; per donor,
acceptors in cell-grid neighbor order (x,y,z relative offsets in (-1,0,1),
ascending atom index within a cell); per acceptor, the donor's hydrogens in
bonded order.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import HBondError, SelectError


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
    """Resolved chain: acceptor indices + donor-major hydrogen CSR
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

        bonded = system.topology.bonded
        donors = []
        h_offsets = [0]
        h_idx = []
        for d in don:
            hs = [int(h) for h in bonded[d] if hyd_mask[h]]
            donors.append(int(d))
            h_idx.extend(hs)
            h_offsets.append(len(h_idx))
        self.acceptors = acc.astype(np.int64)
        self.donors = np.asarray(donors, np.int64)
        self.h_offsets = np.asarray(h_offsets, np.int64)
        self.h_idx = np.asarray(h_idx, np.int64)
        if acc.shape[0] == 0 and self.donors.shape[0] == 0:
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


# ------------------------------------------------------------------ exact-f32
# numpy emulations of the reference's scalar PBC math


def _wrap_loop(p, box):
    """`Vector3D::wrap` loop semantics: while x > L: x -= L; while x < 0:
    x += L (vector3d.rs:380-417). All float32."""
    p = p.astype(np.float32).copy()
    box = np.broadcast_to(box.astype(np.float32), p.shape)
    while True:
        m = p > box
        if not m.any():
            break
        p[m] -= box[m]
    while True:
        m = p < 0.0
        if not m.any():
            break
        p[m] += box[m]
    return p


def _min_image_loop(d, box):
    """`Vector3D::min_image` loop semantics (vector3d.rs:575-592), float32."""
    d = d.astype(np.float32).copy()
    box = np.broadcast_to(box.astype(np.float32), d.shape)
    half = box / np.float32(2.0)
    while True:
        m = d > half
        if not m.any():
            break
        d[m] -= box[m]
    while True:
        m = d < -half
        if not m.any():
            break
        d[m] += box[m]
    return d


def _distance_xyz(a, b, box):
    """`Vector3D::distance(.., XYZ, ..)` (vector3d.rs:458-486), float32."""
    d = _min_image_loop(a - b, box)
    return np.sqrt(d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1] + d[:, 2] * d[:, 2])


def _vector_to(a, b, box):
    """`Vector3D::vector_to` (vector3d.rs:561-569): floor_mod(b - a + L/2, L)
    - L/2, floor_mod(x, y) = (x % y + y) % y with truncated %, float32."""
    box = np.broadcast_to(box.astype(np.float32), a.shape).astype(np.float32)
    half = box / np.float32(2.0)
    x = b - a + half
    return np.fmod(np.fmod(x, box) + box, box) - half


def _axis_offsets(n):
    """Relative offsets -1,0,1 deduped modulo n, preserving order
    (reference: CellNeighbors::convert)."""
    out, seen = [], set()
    for d in (-1, 0, 1):
        m = d % n
        if m not in seen:
            seen.add(m)
            out.append(d)
    return out


def _detect(positions, box, chain_acc: _ChainGroups, chain_don: _ChainGroups,
            max_distance, min_angle):
    """Cell-pruned vectorized detection: acceptors of `chain_acc` against
    donors of `chain_don` (reference: analyze_single, hbonds.rs:229-298).
    Returns a list of HBond in reference order."""
    acceptors = chain_acc.acceptors
    donors = chain_don.donors
    if acceptors.shape[0] == 0 or donors.shape[0] == 0:
        return []

    box = box.astype(np.float32)
    pos = positions.astype(np.float32, copy=False)
    max_distance = np.float32(max_distance)
    min_angle = np.float32(min_angle)

    # --- acceptor cell grid (cell size = max_distance, cellgrid.rs:444,472)
    ncells = np.maximum(np.floor(box / max_distance).astype(np.int64), 1)
    cell_w = (box / ncells.astype(np.float32)).astype(np.float32)
    aw = _wrap_loop(pos[acceptors], box)
    acoord = np.floor(aw / cell_w).astype(np.int64) % ncells
    acid = (acoord[:, 0] * ncells[1] + acoord[:, 1]) * ncells[2] + acoord[:, 2]
    order = np.argsort(acid, kind="stable")  # ascending atom index per cell
    sorted_cells = acid[order]
    total = int(ncells.prod())
    cell_off = np.searchsorted(sorted_cells, np.arange(total + 1))

    dw = _wrap_loop(pos[donors], box)
    dcoord = np.floor(dw / cell_w).astype(np.int64) % ncells

    # --- vectorized candidate generation over the <=27 neighbor offsets
    nd = donors.shape[0]
    d_rank_parts, a_pos_parts, off_rank_parts, within_parts = [], [], [], []
    off_rank = 0
    for dx in _axis_offsets(int(ncells[0])):
        for dy in _axis_offsets(int(ncells[1])):
            for dz in _axis_offsets(int(ncells[2])):
                nb0 = (dcoord[:, 0] + dx) % ncells[0]
                nb1 = (dcoord[:, 1] + dy) % ncells[1]
                nb2 = (dcoord[:, 2] + dz) % ncells[2]
                cid = (nb0 * ncells[1] + nb1) * ncells[2] + nb2
                s = cell_off[cid]
                cnt = cell_off[cid + 1] - s
                nz = np.nonzero(cnt)[0]
                if nz.shape[0] == 0:
                    off_rank += 1
                    continue
                c = cnt[nz]
                rep_d = np.repeat(nz, c)
                grp_start = np.repeat(np.cumsum(c) - c, c)
                within = np.arange(rep_d.shape[0]) - grp_start
                a_pos = np.repeat(s[nz], c) + within
                d_rank_parts.append(rep_d)
                a_pos_parts.append(a_pos)
                within_parts.append(within)
                off_rank_parts.append(np.full(rep_d.shape[0], off_rank, np.int64))
                off_rank += 1

    if not d_rank_parts:
        return []
    d_rank = np.concatenate(d_rank_parts)
    a_rank = order[np.concatenate(a_pos_parts)]  # index into `acceptors`
    off_ranks = np.concatenate(off_rank_parts)
    withins = np.concatenate(within_parts)

    d_idx = donors[d_rank]
    a_idx = acceptors[a_rank]

    # exclude the donor itself; distance criterion (skip when > max_distance)
    keep = d_idx != a_idx
    dist = _distance_xyz(pos[a_idx], pos[d_idx], box)
    keep &= ~(dist > max_distance)
    if not keep.any():
        return []
    d_rank, d_idx, a_idx, dist = d_rank[keep], d_idx[keep], a_idx[keep], dist[keep]
    off_ranks, withins = off_ranks[keep], withins[keep]

    # reference order: donor-major, then neighbor-cell order, then in-cell
    srt = np.lexsort((withins, off_ranks, d_rank))
    d_rank, d_idx, a_idx, dist = d_rank[srt], d_idx[srt], a_idx[srt], dist[srt]

    # --- expand the donor's hydrogens per surviving (donor, acceptor) pair
    h_counts = (chain_don.h_offsets[d_rank + 1] - chain_don.h_offsets[d_rank])
    rep = np.repeat(np.arange(d_rank.shape[0]), h_counts)
    grp_start = np.repeat(np.cumsum(h_counts) - h_counts, h_counts)
    h_slot = np.arange(rep.shape[0]) - grp_start
    h_idx = chain_don.h_idx[chain_don.h_offsets[d_rank][rep] + h_slot]
    d_idx_h = d_idx[rep]
    a_idx_h = a_idx[rep]
    dist_h = dist[rep]

    # --- angle criterion (calc_angle, hbonds.rs:302-338)
    hp = pos[h_idx]
    hd = _vector_to(hp, pos[d_idx_h], box)
    ha = _vector_to(hp, pos[a_idx_h], box)
    dot = hd[:, 0] * ha[:, 0] + hd[:, 1] * ha[:, 1] + hd[:, 2] * ha[:, 2]
    len_hd = np.sqrt(hd[:, 0] * hd[:, 0] + hd[:, 1] * hd[:, 1] + hd[:, 2] * hd[:, 2])
    len_ha = np.sqrt(ha[:, 0] * ha[:, 0] + ha[:, 1] * ha[:, 1] + ha[:, 2] * ha[:, 2])
    with np.errstate(invalid="ignore", divide="ignore"):
        cosang = dot / (len_hd * len_ha)
        angle = np.degrees(np.arccos(cosang)).astype(np.float32)
    nan = np.isnan(angle)
    if nan.any():
        # handle_nan: 180 if H is closer to A than D is to A, else 0
        ha_d = _distance_xyz(pos[h_idx[nan]], pos[a_idx_h[nan]], box)
        da_d = _distance_xyz(pos[d_idx_h[nan]], pos[a_idx_h[nan]], box)
        angle[nan] = np.where(ha_d < da_d, np.float32(180.0), np.float32(0.0))
    keep_h = ~(angle < min_angle)

    return [
        HBond(donor=int(d), hydrogen=int(h), acceptor=int(a),
              distance=float(di), angle=float(an))
        for d, h, a, di, an in zip(
            d_idx_h[keep_h], h_idx[keep_h], a_idx_h[keep_h],
            dist_h[keep_h], angle[keep_h]
        )
    ]


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
                bonds = _detect(pos, box, self.chains[c1], self.chains[c1],
                                self.max_distance, self.min_angle)
            else:
                # reference analyze_pair: acceptors(c1) x donors(c2), then
                # acceptors(c2) x donors(c1) (hbonds.rs:207-225)
                bonds = _detect(pos, box, self.chains[c1], self.chains[c2],
                                self.max_distance, self.min_angle)
                bonds += _detect(pos, box, self.chains[c2], self.chains[c1],
                                 self.max_distance, self.min_angle)
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
