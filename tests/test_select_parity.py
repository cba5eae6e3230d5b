"""Selection-language error taxonomy + geometry-filter iterator parity
(reference: select/mod.rs fail_tests:2659+, iterators.rs:1699-1900)."""

import os

import numpy as np
import pytest

from groan_rs_tpu.core.dimension import Dimension
from groan_rs_tpu.core.shapes import Cylinder, Rectangular, Sphere
from groan_rs_tpu.errors import SelectError
from groan_rs_tpu.select import parse_query
from groan_rs_tpu.system import System


@pytest.mark.parametrize("query", [
    "",                                   # EmptyQuery
    "resname LYS and resname",            # EmptyArgument
    "name BB or name",
    "resid 1-3 or resid",
    "atomnum 65 66 69 and serial",
    "Protein Membrane and group",
    "resid 1 to x",                       # InvalidNumber
    "serial 25 24 23 22 21 2O 19 18 17",
    "serial 19 20 21 21.5 22 22.3",
    "resid 25-20",                        # inverted ranges
    "resid 25 -20",
    "resid 25- 20",
    "resid 25 - 20",
    "serial <",
    "serial <==7",
    "resid <<=  7",
    "atomnum <<=7",
    "atomnum 1 5 >",
    "atomnum 1 -> 8",
    "chain AB",                           # InvalidChainId
    "chain myidentifier",
    "(resname LYS and name SC1",          # InvalidParentheses
    "resname LYS and name SC1)",
    "((resname LYS and name SC1)",
    "(((resname LYS and name SC1))))",
    "(resname LYS) and (name SC1))",
    "resname LYS and",                    # MissingArgument
    "or serial 2-154",
])
def test_parse_query_fails(query):
    with pytest.raises(SelectError):
        parse_query(query)


@pytest.mark.parametrize("query", [
    "resname LYS",
    "serial 1 to 10",
    "resid 1 - 5 or resid 7",
    "name BB SC1 and resname LEU LYS",
    "!(resname W) && serial < 100",
    "(name BB || name SC1) and not resname W ION",
    "serial >= 16840",
    "@protein or @water",
    "resname r'^PO.*'",
])
def test_parse_query_succeeds(query):
    assert parse_query(query) is not None


def test_filter_geometry_iterators(test_files):
    """reference: iterators.rs:1699 — atoms_iter().filter_geometry(shape)
    yields exactly the group created from the same shape."""
    s = System.from_file(os.path.join(test_files, "example.gro"))

    shapes = {
        "Sphere": Sphere([10.5, 11.2, 1.7], 4.0),
        "Cylinder": Cylinder([0.5, 1.2, 10.3], 2.5, 4.5, Dimension.Z),
        "Rectangular": Rectangular([1.3, 12.4, 10.7], 6.5, 4.5, 5.0),
    }
    for name, shape in shapes.items():
        s.group_create_from_geometry(name, "all", shape)
        filtered = [int(i) for i in s.atoms_filter_geometry(shape)]
        group = list(s.group_indices(name))
        assert filtered == group, name
        assert len(filtered) == s.group_get_n_atoms(name)
        assert len(filtered) > 0, name


@pytest.mark.parametrize("query", ["''", '""'])
def test_empty_quotes_fail(query):
    """select/mod.rs empty_quotes_1..4 — quoted empty strings are
    EmptyQuery/EmptyArgument errors."""
    with pytest.raises(SelectError):
        parse_query(query)


def test_invalid_regex_fails():
    """select/mod.rs invalid_regex — a malformed regex names the token."""
    with pytest.raises(SelectError, match=r"\*L\*"):
        parse_query("name r'*L*'")


def test_regex_group_expansion_semantics(test_files):
    """select/mod.rs expand_regex_group* — group regexes expand against
    existing group names; an all-empty expansion errors, a partial match
    succeeds."""
    from groan_rs_tpu.errors import GroupError
    from groan_rs_tpu.system import System as S

    s = S.from_file(os.path.join(test_files, "example.gro"))
    s.read_ndx(os.path.join(test_files, "index.ndx"))
    s.group_create("Matched", "group r'^Prot.*'")
    assert s.group_get_n_atoms("Matched") >= s.group_get_n_atoms("Protein")
    with pytest.raises((SelectError, GroupError)):
        s.group_create("NoMatch", "group r'^Zebra.*'")


def test_select_reparse_stability(test_files):
    """select/mod.rs *_to_yaml analogue — our serde keeps the query string;
    re-parsing an already-parsed query's source selects the same atoms."""
    s = System.from_file(os.path.join(test_files, "example.gro"))
    for q in ("resname LYS", "(name BB || name SC1) and not resname W ION",
              "serial 1 to 10 or @protein"):
        s.group_create("A", q)
        s.group_create("B", q)
        assert s.group_get_n_atoms("A") == s.group_get_n_atoms("B")
        s.group_remove("A"); s.group_remove("B")


def test_shape_getters():
    """shape.rs getter surface (get_position/get_radius/get_x/.../
    get_base1-3/get_height/get_orientation/get_plane)."""
    from groan_rs_tpu.core.dimension import Dimension
    from groan_rs_tpu.core.shapes import (Cylinder, Rectangular, Sphere,
                                          TriangularPrism)
    from groan_rs_tpu.core.vector3d import Vector3D

    sp = Sphere([1.0, 2.0, 3.0], 0.5)
    assert isinstance(sp.get_position(), Vector3D)
    assert sp.get_position().tolist() == [1.0, 2.0, 3.0]
    assert sp.get_radius() == 0.5

    r = Rectangular([0.0, 0.0, 0.0], 1.0, 2.0, 3.0)
    assert (r.get_x(), r.get_y(), r.get_z()) == (1.0, 2.0, 3.0)

    c = Cylinder([1.0, 1.0, 1.0], 0.7, 2.0, Dimension.Z)
    assert c.get_radius() == 0.7 and c.get_height() == 2.0
    assert c.get_orientation() is Dimension.Z and c.get_plane() is Dimension.XY

    t = TriangularPrism([0, 0, 0], [1, 0, 0], [0, 1, 0], 2.0)
    assert t.get_base2().tolist() == [1.0, 0.0, 0.0]
    assert t.get_height() == 2.0 and t.get_orientation() is Dimension.Z
