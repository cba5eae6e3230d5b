"""Groan Selection Language AST.

Mirrors the reference `Select` enum (`src/select/mod.rs:19-34`) and the
`Name` enum (`src/select/name.rs`).  Nodes are plain dataclasses; evaluation
to boolean masks lives in `compile.py`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..errors import SelectError


class Name:
    """Plain string or `r'...'` regex (reference: select/name.rs:19-29).

    Regex matching uses *search* semantics (fancy_regex `is_match`), so
    user patterns anchor themselves with `^...$` when needed.
    """

    __slots__ = ("raw", "regex")

    def __init__(self, token: str):
        if token.startswith("r'") and token.endswith("'") and len(token) >= 3:
            pattern = token[2:-1]
            try:
                self.regex = re.compile(pattern)
            except re.error as e:
                raise SelectError(
                    f"invalid regular expression '{pattern}': {e}",
                    code=SelectError.INVALID_REGEX,
                ) from None
            self.raw = pattern
        else:
            self.regex = None
            self.raw = token

    def matches(self, value: str) -> bool:
        if self.regex is not None:
            return self.regex.search(value) is not None
        return self.raw == value

    @property
    def is_regex(self) -> bool:
        return self.regex is not None

    def __repr__(self) -> str:  # pragma: no cover
        return f"Name(r'{self.raw}')" if self.regex else f"Name({self.raw!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Name) and self.raw == other.raw and (self.regex is None) == (other.regex is None)


@dataclass
class Select:
    pass


@dataclass
class ResidueName(Select):
    names: list = field(default_factory=list)


@dataclass
class AtomName(Select):
    names: list = field(default_factory=list)


@dataclass
class ResidueNumber(Select):
    ranges: list = field(default_factory=list)  # inclusive (start, end)


@dataclass
class GmxAtomNumber(Select):
    ranges: list = field(default_factory=list)


@dataclass
class AtomNumber(Select):
    ranges: list = field(default_factory=list)


@dataclass
class Chain(Select):
    identifiers: list = field(default_factory=list)


@dataclass
class GroupName(Select):
    names: list = field(default_factory=list)


@dataclass
class LabeledAtom(Select):
    names: list = field(default_factory=list)


@dataclass
class ElementName(Select):
    names: list = field(default_factory=list)


@dataclass
class ElementSymbol(Select):
    names: list = field(default_factory=list)


@dataclass
class And(Select):
    left: Select = None
    right: Select = None


@dataclass
class Or(Select):
    left: Select = None
    right: Select = None


@dataclass
class Not(Select):
    operand: Select = None


@dataclass
class Molecule(Select):
    operand: Select = None
