"""Elements database parity (reference: structures/element.rs inline tests,
elements_*.yaml fixtures)."""

import os

import pytest

from groan_rs_tpu.core.elements import Elements
from groan_rs_tpu.errors import ElementError


def _p(test_files, name):
    return os.path.join(test_files, name)


def test_default_elements():
    e = Elements.default()
    c = e.get("carbon")
    assert c is not None
    assert c.symbol == "C"
    assert c.mass == pytest.approx(12.0107)
    h = e.get("hydrogen")
    assert h.symbol == "H"
    assert h.mass == pytest.approx(1.0079)


@pytest.mark.parametrize("name", [
    "elements_invalid_field.yaml",
    "elements_invalid_query.yaml",
    "elements_invalid_mass.yaml",
    "elements_invalid_vdw.yaml",
])
def test_elements_invalid_files(test_files, name):
    with pytest.raises(ElementError):
        Elements.from_file(_p(test_files, name))


def test_elements_invalid_group_fails_at_guess(test_files):
    """A query referencing a nonexistent group parses fine but fails when
    applied (reference: guess.rs:1233-1250)."""
    from groan_rs_tpu.system import System

    e = Elements.from_file(_p(test_files, "elements_invalid_group.yaml"))
    s = System.from_file(_p(test_files, "example.gro"))
    with pytest.raises(ElementError):
        s.guess_elements(e)


def test_elements_update(test_files):
    """reference: element.rs:466-505 — merge semantics, exact post-update
    values."""
    e = Elements.default()
    e.update(Elements.from_file(_p(test_files, "elements_update.yaml")))
    assert len(e.names()) == 40

    dummy = e.get("dummy")
    assert dummy.symbol is None
    assert dummy.select is not None
    assert dummy.mass == pytest.approx(0.0)
    assert dummy.vdw is None
    assert dummy.expected_max_bonds is None

    c = e.get("carbon")
    assert c.symbol == "C"
    assert c.mass == pytest.approx(12.0107)
    assert c.vdw == pytest.approx(0.20)
    assert c.expected_max_bonds == 4 and c.expected_min_bonds == 2

    h = e.get("hydrogen")
    assert h.symbol == "HH"
    assert h.mass == pytest.approx(2.014)
    assert h.expected_max_bonds == 8 and h.expected_min_bonds == 2

    assert e.get("polonium") is not None


def test_elements_update_applies_to_guessing(test_files):
    """An updated database changes guessed properties (guess.rs
    elements_update flow)."""
    from groan_rs_tpu.system import System

    s = System.from_file(_p(test_files, "aa_membrane_peptide.gro"))
    e = Elements.default()
    e.update(Elements.from_file(_p(test_files, "elements_update.yaml")))
    s.guess_elements(e)
    # hydrogen's symbol is now 'HH' and mass 2.014
    s.group_create("H", "element name hydrogen")
    idx = s.group_indices("H")
    assert len(idx) > 0
    a = s.get_atom(int(idx[0]))
    assert a.get_element_symbol() == "HH"
    assert a.get_mass() == pytest.approx(2.014)
