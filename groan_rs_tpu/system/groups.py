"""Group management methods (reference: `src/system/groups.rs`)."""

from __future__ import annotations

import numpy as np

from ..core.container import AtomContainer
from ..errors import GroupError, SelectError, SimBoxError
from ..select import parse_query
from ..select.compile import evaluate_mask
from .core import Group, name_is_valid


class GroupsMixin:
    # ------------------------------------------------------------- creation
    def group_create(self, name: str, query: str):
        """Create a group from a GSL query (reference: groups.rs:43)."""
        if not name_is_valid(name):
            raise GroupError(f"invalid group name '{name}'", code="InvalidName")
        try:
            mask = evaluate_mask(parse_query(query), self)
        except SelectError as e:
            raise GroupError(f"invalid query '{query}': {e}", code="InvalidQuery") from e
        self._add_group(name, Group(AtomContainer.from_mask(mask)))

    def group_create_from_select(self, name: str, select):
        """reference: groups.rs:295 (pre-parsed Select tree)."""
        if not name_is_valid(name):
            raise GroupError(f"invalid group name '{name}'", code="InvalidName")
        mask = evaluate_mask(select, self)
        self._add_group(name, Group(AtomContainer.from_mask(mask)))

    def group_create_from_geometry(self, name: str, query: str, geometry):
        """reference: groups.rs:94 — query AND inside(shape)."""
        self.group_create_from_geometries(name, query, [geometry])

    def group_create_from_geometries(self, name: str, query: str, geometries):
        """reference: groups.rs:164."""
        if not name_is_valid(name):
            raise GroupError(f"invalid group name '{name}'", code="InvalidName")
        if not self.has_box():
            raise GroupError("system has no simulation box", code="InvalidSimBox")
        if not self.simbox.is_orthogonal():
            raise GroupError(
                "simulation box is not orthogonal", code="InvalidSimBox"
            )
        try:
            mask = evaluate_mask(parse_query(query), self)
        except SelectError as e:
            raise GroupError(f"invalid query '{query}': {e}", code="InvalidQuery") from e
        box = self.simbox.to_lengths_vec()
        # atoms with undefined positions are never selected (reference doc)
        mask = mask & self.has_position
        for geom in geometries:
            mask = mask & np.asarray(geom.inside(self.positions, box))
        self._add_group(name, Group(AtomContainer.from_mask(mask)))

    def group_create_from_indices(self, name: str, indices):
        """reference: groups.rs:215 — invalid indices are dropped silently."""
        if not name_is_valid(name):
            raise GroupError(f"invalid group name '{name}'", code="InvalidName")
        self._add_group(
            name, Group(AtomContainer.from_indices(indices, self.get_n_atoms()))
        )

    def group_create_from_ranges(self, name: str, ranges):
        """reference: groups.rs:249 — inclusive index ranges."""
        if not name_is_valid(name):
            raise GroupError(f"invalid group name '{name}'", code="InvalidName")
        self._add_group(
            name, Group(AtomContainer.from_ranges(ranges, self.get_n_atoms()))
        )

    # ------------------------------------------------------------- splitting
    def atoms_split_by_resid(self):
        """reference: groups.rs:344 — groups named 'resid X'."""
        return self.group_split_by_resid("all")

    def group_split_by_resid(self, name: str):
        """reference: groups.rs:391."""
        idx = self.group_indices(name)  # raises NotFound
        resnums = self.topology.resnum[idx]
        names: list[str] = []
        seen = {}
        for i, r in zip(idx, resnums):
            gname = f"resid {r}"
            if gname not in seen:
                seen[gname] = []
                names.append(gname)
            seen[gname].append(int(i))
        for gname, atoms in seen.items():
            self.group_create_from_indices(gname, atoms)
        return names

    def atoms_split_by_resname(self):
        """reference: groups.rs:468 — groups named 'resname X'."""
        return self.group_split_by_resname("all")

    def group_split_by_resname(self, name: str):
        """reference: groups.rs:514."""
        idx = self.group_indices(name)
        values = self.topology.resname.values()[idx]
        names: list[str] = []
        seen = {}
        for i, r in zip(idx, values):
            gname = f"resname {r}"
            if gname not in seen:
                seen[gname] = []
                names.append(gname)
            seen[gname].append(int(i))
        for gname, atoms in seen.items():
            self.group_create_from_indices(gname, atoms)
        return names

    # ------------------------------------------------------------- algebra
    def group_union(self, group1: str, group2: str, union: str):
        """reference: groups.rs:679."""
        g1, g2 = self._get_group(group1), self._get_group(group2)
        if not name_is_valid(union):
            raise GroupError(f"invalid group name '{union}'", code="InvalidName")
        self._add_group(union, Group(g1.atoms.union(g2.atoms)))

    def group_intersection(self, group1: str, group2: str, intersection: str):
        """reference: groups.rs:699."""
        g1, g2 = self._get_group(group1), self._get_group(group2)
        if not name_is_valid(intersection):
            raise GroupError(f"invalid group name '{intersection}'", code="InvalidName")
        self._add_group(intersection, Group(g1.atoms.intersection(g2.atoms)))

    def group_extend(self, group: str, extend: str):
        """reference: groups.rs:716 — add atoms of `extend` into `group`."""
        g, e = self._get_group(group), self._get_group(extend)
        g.atoms = g.atoms.union(e.atoms)

    def group_remove(self, name: str):
        """Remove a group; 'all'/'All' cannot be removed."""
        if name in ("all", "All"):
            raise GroupError(f"cannot remove default group '{name}'", code="ProtectedGroup")
        self._get_group(name)
        del self.groups[name]

    def group_rename(self, old: str, new: str):
        if old in ("all", "All"):
            raise GroupError(f"cannot rename default group '{old}'", code="ProtectedGroup")
        if not name_is_valid(new):
            raise GroupError(f"invalid group name '{new}'", code="InvalidName")
        g = self._get_group(old)
        del self.groups[old]
        self._add_group(new, g)

    def groups_member(self, index: int) -> list[str]:
        """All groups containing the atom (reference: groups.rs:781)."""
        return [n for n, g in self.groups.items() if g.atoms.isin(index)]

    # ------------------------------------------------------- ndx writability
    def group_make_writable(self, name: str):
        """Mark a group for inclusion in write_ndx output
        (reference: groups.rs:565)."""
        self._get_group(name).print_ndx = True

    def group_make_nonwritable(self, name: str):
        """Exclude a group from write_ndx output (reference: groups.rs:574)."""
        self._get_group(name).print_ndx = False

    def group_names_writable(self) -> list:
        """Names of ndx-writable groups (reference: groups.rs:743)."""
        return [n for n, g in self.groups.items() if g.print_ndx]
