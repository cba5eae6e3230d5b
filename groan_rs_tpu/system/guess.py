"""Element / property / bond guessing (reference: `src/system/guess.rs`).

TPU-native re-design: each element's GSL query compiles to one vectorized
`bool[N]` mask (instead of the reference's per-atom, per-element AST walk,
guess.rs:131-195), and bond guessing runs a vectorized cell-pair sweep over
the CSR cell grid instead of a per-atom neighbor iterator (guess.rs:362+).

Non-fatal issues (atoms with no matching element, multiple candidates,
over/under-bonded atoms) surface as `GuessWarning` Python warnings carrying
the same info the reference packs into its *Warning error variants; the
system IS modified, matching reference behaviour.
"""

from __future__ import annotations

import warnings

import numpy as np

from ..core.elements import Elements
from ..errors import ElementError, GuessWarning, SelectError

DEFAULT_RADIUS_FACTOR = 0.55  # reference: guess.rs:19


class GuessMixin:
    # ------------------------------------------------------------- elements
    def guess_elements(self, elements: Elements | None = None):
        """Assign elements to all atoms (reference: guess.rs:114)."""
        self._guess_elements_partial(elements or Elements.default(), for_all=True)

    def guess_elements_unknown(self, elements: Elements | None = None):
        """Assign elements only to atoms without one (reference: guess.rs:125)."""
        self._guess_elements_partial(elements or Elements.default(), for_all=False)

    def _element_masks(self, elements: Elements) -> list[tuple[str, np.ndarray]]:
        from ..select.compile import evaluate_mask

        masks = []
        for name, elem in elements.elements.items():
            if elem.select is None:
                continue
            try:
                masks.append((name, evaluate_mask(elem.select, self)))
            except SelectError as e:
                raise ElementError(
                    f"invalid query of element '{name}': {e}", code="InvalidQuery"
                ) from e
        return masks

    def _guess_elements_partial(self, elements: Elements, for_all: bool):
        n = self.get_n_atoms()
        masks = self._element_masks(elements)

        eligible = np.ones(n, dtype=bool)
        if not for_all:
            has_el = (self.topology.element_name.values() != "") | (
                self.topology.element_symbol.values() != ""
            )
            eligible = ~has_el

        if masks:
            stack = np.stack([m for _, m in masks])  # [E, N]
            match_count = stack.sum(axis=0)
            first = np.argmax(stack, axis=0)  # first matching element index
            any_match = stack.any(axis=0)
        else:
            match_count = np.zeros(n, np.int64)
            first = np.zeros(n, np.int64)
            any_match = np.zeros(n, bool)

        no_elements = []
        multiple: dict[tuple, list[int]] = {}
        names = [name for name, _ in masks]
        for a in np.nonzero(eligible)[0]:
            if not any_match[a]:
                no_elements.append(int(a) + 1)
                continue
            ename = names[first[a]]
            self._set_atom_element_properties(int(a), elements.elements[ename])
            if match_count[a] > 1:
                key = tuple(names[e] for e in np.nonzero(stack[:, a])[0])
                multiple.setdefault(key, []).append(int(a) + 1)

        if no_elements or multiple:
            warnings.warn(
                GuessWarning(
                    f"element guessing: {len(no_elements)} atom(s) matched no element; "
                    f"{sum(len(v) for v in multiple.values())} atom(s) matched multiple "
                    f"elements {sorted(set(k for k in multiple))}"
                ),
                stacklevel=3,
            )

    def _set_atom_element_properties(self, index: int, elem):
        """reference: set_atom_properties (guess.rs:520)."""
        topo = self.topology
        topo.element_name.set(index, elem.name)
        if elem.symbol is not None:
            topo.element_symbol.set(index, elem.symbol)
        if elem.mass is not None:
            topo.mass[index] = elem.mass
            topo.has_mass[index] = True
        if elem.vdw is not None:
            topo.vdw[index] = elem.vdw
            topo.has_vdw[index] = True
        if elem.expected_max_bonds is not None:
            topo.expected_max_bonds[index] = elem.expected_max_bonds
            topo.has_expected_max_bonds[index] = True
        if elem.expected_min_bonds is not None:
            topo.expected_min_bonds[index] = elem.expected_min_bonds
            topo.has_expected_min_bonds[index] = True

    # ------------------------------------------------------------- properties
    def guess_properties(self, elements: Elements | None = None):
        """Assign mass/vdw/bond expectations from already-assigned element
        names (reference: guess.rs:255)."""
        elements = elements or Elements.default()
        topo = self.topology
        info = {"no_element": [], "not_recognized": [], "no_mass": [], "no_vdw": [],
                "no_max_bonds": [], "no_min_bonds": []}
        for a in range(self.get_n_atoms()):
            elname = topo.element_name.get(a)
            if not elname:
                info["no_element"].append(a + 1)
                continue
            elem = elements.get(elname)
            if elem is None:
                info["not_recognized"].append(a + 1)
                continue
            if elem.mass is None:
                info["no_mass"].append(a + 1)
            else:
                topo.mass[a] = elem.mass
                topo.has_mass[a] = True
            if elem.vdw is None:
                info["no_vdw"].append(a + 1)
            else:
                topo.vdw[a] = elem.vdw
                topo.has_vdw[a] = True
            if elem.expected_max_bonds is None:
                info["no_max_bonds"].append(a + 1)
            else:
                topo.expected_max_bonds[a] = elem.expected_max_bonds
                topo.has_expected_max_bonds[a] = True
            if elem.expected_min_bonds is None:
                info["no_min_bonds"].append(a + 1)
            else:
                topo.expected_min_bonds[a] = elem.expected_min_bonds
                topo.has_expected_min_bonds[a] = True
        if any(info.values()):
            warnings.warn(
                GuessWarning("property guessing incomplete: " +
                             ", ".join(f"{k}={len(v)}" for k, v in info.items() if v)),
                stacklevel=2,
            )

    # ------------------------------------------------------------- bonds
    def guess_bonds(self, radius_factor: float | None = None):
        """Guess bonds from vdw radii (reference: guess.rs:362):
        bond if distance < radius_factor * (vdw_i + vdw_j)."""
        from ..core.cellgrid import CellGrid
        from ..errors import CellGridError
        from ..ops import pbc

        n = self.get_n_atoms()
        if n == 0:
            return
        factor = radius_factor if radius_factor is not None else DEFAULT_RADIUS_FACTOR
        topo = self.topology

        has_vdw = topo.has_vdw
        no_vdw = (np.nonzero(~has_vdw)[0] + 1).tolist()
        max_vdw = float(topo.vdw[has_vdw].max()) if has_vdw.any() else 0.0
        cell = 2.0 * factor * max_vdw
        if cell <= 0.0:
            raise ElementError("no van der Waals radii available", code="BondGuessError")

        try:
            grid = CellGrid(self, "all", cell)
        except CellGridError as e:
            raise ElementError(str(e), code="BondGuessError") from e

        box = self.box_lengths()
        pos = self.positions
        vdw = topo.vdw
        pairs = []
        for a_idx, b_idx, same in grid.neighbor_cell_pairs():
            va = has_vdw[a_idx]
            vb = has_vdw[b_idx]
            a_use = a_idx[va]
            b_use = b_idx[vb]
            if a_use.shape[0] == 0 or b_use.shape[0] == 0:
                continue
            from ..ops import distances as dops

            dm = np.asarray(dops.distance_matrix(pos[a_use], pos[b_use], box))
            limit = factor * (vdw[a_use][:, None] + vdw[b_use][None, :])
            hits = dm < limit
            if same:
                # upper triangle only, no self pairs
                hits = np.triu(hits, k=1)
            ai, bi = np.nonzero(hits)
            for i, j in zip(a_use[ai], b_use[bi]):
                if i != j:
                    pairs.append((min(int(i), int(j)), max(int(i), int(j))))

        topo.set_bonds_from_pairs(set(pairs))

        # over/under-bonded warnings (reference: check_unexpected_bonds)
        n_bonded = np.array([len(b) for b in topo.bonded])
        too_many = np.nonzero(topo.has_expected_max_bonds & (n_bonded > topo.expected_max_bonds))[0]
        too_few = np.nonzero(topo.has_expected_min_bonds & (n_bonded < topo.expected_min_bonds))[0]
        if no_vdw or len(too_many) or len(too_few):
            warnings.warn(
                GuessWarning(
                    f"bond guessing: {len(no_vdw)} atom(s) without vdw, "
                    f"{len(too_many)} over-bonded, {len(too_few)} under-bonded"
                ),
                stacklevel=2,
            )
