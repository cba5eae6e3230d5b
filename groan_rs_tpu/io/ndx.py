"""Gromacs index (.ndx) file reading/writing.

reference: `src/io/ndx_io.rs` — `[ name ]` sections of 1-based atom serials
(`read_ndx:39`, `Groups::from_ndx:106`), invalid/duplicate names surface as
warnings while the system is still updated, writer `write_ndx:82` +
`Group::write_ndx` (group.rs:298): 15 serials per line, `{:4}` width.
"""

from __future__ import annotations

import warnings

import numpy as np

from ..core.container import AtomContainer
from ..errors import ParseNdxError, WriteNdxError


class NdxWarning(UserWarning):
    """Invalid or duplicate group names in an ndx file (system still updated)."""


def parse_ndx(filename, n_atoms: int):
    """Parse an ndx file -> (ordered {name: indices}, invalid, duplicate)."""
    try:
        with open(filename) as fh:
            raw = fh.read().splitlines()
    except OSError:
        raise ParseNdxError(f"file '{filename}' was not found", code="FileNotFound") from None

    groups: dict[str, np.ndarray] = {}
    invalid: set[str] = set()
    duplicate: set[str] = set()
    current_name = ""
    indices: list[int] = []

    def store():
        from ..system.core import name_is_valid

        if not current_name:
            return
        if not name_is_valid(current_name):
            invalid.add(current_name)
            return
        if current_name in groups:
            duplicate.add(current_name)
            # keep the first occurrence (reference: Groups::add refuses overwrite here)
            return
        groups[current_name] = np.asarray(sorted(set(indices)), dtype=np.int64)

    for line in raw:
        if not line.strip():
            continue
        if "[" in line and "]" in line:
            store()
            indices = []
            name = line.replace("[", "").replace("]", "").strip()
            if not name:
                raise ParseNdxError(f"could not parse group name from '{line.rstrip()}'")
            current_name = name
        else:
            for raw_id in line.split():
                try:
                    serial = int(raw_id)
                except ValueError:
                    raise ParseNdxError(
                        f"could not parse line '{line.rstrip()}'"
                    ) from None
                if serial < 0:
                    # reference parses usize: '-22' is a line parse error,
                    # not an invalid index (ndx_io.rs read_invalid_line)
                    raise ParseNdxError(
                        f"could not parse line '{line.rstrip()}'"
                    )
                if serial == 0 or serial > n_atoms:
                    raise ParseNdxError(
                        f"invalid atom index {serial}", code="InvalidAtomIndex"
                    )
                indices.append(serial - 1)
    store()
    return groups, invalid, duplicate


def from_ndx(filename, n_atoms: int):
    """Parse an ndx file into a standalone `{name: Group}` registry plus
    the (invalid, duplicate) name sets (reference: Groups::from_ndx,
    ndx_io.rs:106)."""
    from ..system.core import Group

    groups, invalid, duplicate = parse_ndx(filename, n_atoms)
    return (
        {name: Group(AtomContainer.from_indices(idx, n_atoms))
         for name, idx in groups.items()},
        invalid, duplicate,
    )


def read_ndx(system, filename):
    """reference: System::read_ndx (ndx_io.rs:39).

    Updates the system's groups; emits `NdxWarning` for invalid names,
    duplicate ndx groups, and groups that overwrite existing system groups.
    """
    from ..system.core import Group

    groups, invalid, duplicate = parse_ndx(filename, system.get_n_atoms())
    for name, idx in groups.items():
        if name in system.groups:
            duplicate.add(name)
        system.groups[name] = Group(
            AtomContainer.from_indices(idx, system.get_n_atoms()), print_ndx=True
        )
    if invalid:
        warnings.warn(
            f"invalid group names in ndx file: {sorted(invalid)}", NdxWarning, stacklevel=2
        )
    if duplicate:
        warnings.warn(
            f"duplicate groups in ndx file: {sorted(duplicate)}", NdxWarning, stacklevel=2
        )


def write_ndx_group(fh, name, group):
    """One `[ name ]` ndx section (reference: group.rs:298 write_ndx)."""
    fh.write(f"[ {name} ]\n")
    idx = group.atoms.indices()
    n = idx.shape[0]
    for k in range(n):
        serial = idx[k] + 1
        if (k + 1) % 15 == 0 or k == n - 1:
            fh.write(f"{serial:4}\n")
        else:
            fh.write(f"{serial:4} ")


def write_ndx(system, filename):
    """reference: System::write_ndx (ndx_io.rs:82)."""
    try:
        fh = open(filename, "w")
    except OSError:
        raise WriteNdxError(f"could not create file '{filename}'", code="CouldNotCreate") from None
    with fh:
        for name, group in system.groups.items():
            if not group.print_ndx:
                continue
            write_ndx_group(fh, name, group)
