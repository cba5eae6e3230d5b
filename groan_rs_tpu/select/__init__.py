"""Groan Selection Language: parser + vectorized mask compiler.

reference: `src/select/` (grammar) evaluated per-atom by
`src/structures/group.rs:186-290`; here queries compile to `bool[N]` masks.
"""

from . import ast
from .compile import evaluate_mask, select_to_mask
from .parser import parse_query

__all__ = ["ast", "parse_query", "evaluate_mask", "select_to_mask"]
