"""Groan Selection Language parser.

Same grammar as the reference (`src/select/mod.rs:46-886`,
`src/select/numbers.rs`): macro expansion (@protein/@water/...), keyword ->
symbol rewrite (and/or/not/to), `mol with`/`molecule with` -> `@@`,
recursive descent over parentheses with `!`, `&&`, `||`, `@@`, `r'...'`
regex blocks, quoted names, and the number-range mini-language
(`5 - 8`, `5 to 8`, `> 10`, `<= 3`).
"""

from __future__ import annotations

import re

from ..errors import SelectError
from . import ast
from .macros import MACROS


def parse_query(query: str) -> ast.Select:
    """reference: Select::parse_query (select/mod.rs:46)."""
    if not query or not query.strip():
        raise SelectError("empty query", code=SelectError.EMPTY_QUERY)

    if query.count("(") != query.count(")"):
        raise SelectError(
            f"unbalanced parentheses in '{query}'", code=SelectError.INVALID_PARENTHESES
        )
    if query.count("'") % 2 != 0 or query.count('"') % 2 != 0:
        raise SelectError(f"unbalanced quotes in '{query}'", code=SelectError.INVALID_QUOTES)

    expression = query
    if "@" in expression:
        for macro, expansion in MACROS.items():
            expression = expression.replace(macro, expansion)

    # `mol with` / `molecule with` -> `@@` (outside single-quote blocks)
    expression = _MOLWITH_RE.sub("@@", expression)

    expression = _replace_keywords(expression)

    return _parse_subquery(expression, 0, len(expression))


# matches `molecule with`/`mol with` not inside single-quote blocks
# (reference: select/mod.rs:70-74)
_MOLWITH_RE = re.compile(r"(molecule\s*with|mol\s*with)(?=(?:[^']*'[^']*')*[^']*$)")


def _replace_keywords(inp: str) -> str:
    """reference: replace_keywords (select/mod.rs:653)."""
    out = []
    i = 0
    inside_quotes = False
    n = len(inp)
    while i < n:
        c = inp[i]
        if c in "'\"":
            inside_quotes = not inside_quotes
            out.append(c)
            i += 1
            continue
        if inside_quotes:
            out.append(c)
            i += 1
            continue
        if c.isalpha():
            j = i
            while j < n and inp[j].isalpha():
                j += 1
            kw = inp[i:j]
            out.append({"and": "&&", "or": "||", "not": "!", "to": "-"}.get(kw, kw))
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _find_parenthesis(expr: str, start: int, end: int):
    opened = closed = 0
    for idx in range(start, len(expr)):
        c = expr[idx]
        if c == "(":
            opened += 1
        elif c == ")":
            closed += 1
            if opened == closed:
                return idx
        if idx > end:
            return None
    return None


def _parse_subquery(expr: str, start: int, end: int) -> ast.Select:
    """reference: parse_subquery (select/mod.rs:394-508)."""
    tree = None
    token = []
    unary = []  # 'not' | 'mol'
    binary = None  # 'and' | 'or'
    inside_regex = False
    i = start

    def flush_token():
        nonlocal tree, binary
        text = "".join(token)
        if text.strip():
            parsed = _parse_token(text)
            tree = _process_operation(tree, parsed, unary, binary)
            token.clear()
            binary = None
            return True
        return False

    while i < end:
        c = expr[i]
        if inside_regex:
            if c == "'":
                inside_regex = False
            token.append(c)
            i += 1
            continue

        if c == "(":
            new_end = _find_parenthesis(expr, i, end)
            if new_end is None:
                raise SelectError("unbalanced parentheses", code=SelectError.INVALID_PARENTHESES)
            parsed = _parse_subquery(expr, i + 1, new_end)
            tree = _process_operation(tree, parsed, unary, binary)
            binary = None
            i = new_end + 1
        elif c == ")":
            i += 1
        elif c in "&|":
            if expr[i + 1 : i + 2] != c:
                raise SelectError(f"invalid operator in '{expr}'", code=SelectError.INVALID_OPERATOR)
            text = "".join(token)
            if text.strip():
                parsed = _parse_token(text)
                tree = _process_operation(tree, parsed, unary, binary)
                token.clear()
            binary = "and" if c == "&" else "or"
            i += 2
        elif c == "!":
            unary.append("not")
            i += 1
        elif c == "@":
            if expr[i + 1 : i + 2] != "@":
                raise SelectError(f"invalid operator in '{expr}'", code=SelectError.INVALID_OPERATOR)
            unary.append("mol")
            i += 2
        elif c == "r" and expr[i + 1 : i + 2] == "'":
            token.append("r'")
            inside_regex = True
            i += 2
        else:
            token.append(c)
            i += 1

    text = "".join(token)
    if text.strip():
        parsed = _parse_token(text)
        tree = _process_operation(tree, parsed, unary, binary)
    elif binary is not None:
        raise SelectError("operator missing an argument", code=SelectError.MISSING_ARGUMENT)

    if tree is None:
        raise SelectError("could not parse query", code=SelectError.UNKNOWN)
    return tree


def _process_operation(tree, parsed, unary: list, binary):
    """reference: process_operation (select/mod.rs:510-555)."""
    for op in unary:
        parsed = ast.Not(parsed) if op == "not" else ast.Molecule(parsed)
    unary.clear()

    if binary is not None:
        if tree is None:
            raise SelectError("binary operator missing left side", code=SelectError.MISSING_ARGUMENT)
        return ast.And(tree, parsed) if binary == "and" else ast.Or(tree, parsed)
    if tree is not None:
        raise SelectError(
            "two expressions without an operator", code=SelectError.INVALID_TOKEN_PARENTHESES
        )
    return parsed


def _split_with_quotes(string: str) -> list[str]:
    """Whitespace split keeping quoted blocks together
    (reference: split_with_quotes, select/mod.rs:703-757)."""
    result = [""]
    inside = False
    regex = False
    i = 0
    n = len(string)
    while i < n:
        c = string[i]
        if c == "r" and not inside and string[i + 1 : i + 2] == "'":
            regex = True
            inside = True
            result[-1] += "r'"
            i += 2
            continue
        if c in "'\"":
            inside = not inside
            if regex:
                result[-1] += c
                regex = False
            i += 1
            continue
        if c.isspace() and not inside:
            result.append("")
            i += 1
            continue
        result[-1] += c
        i += 1
    return [s for s in result if s.strip()]


def _collect_words(tokens) -> list[ast.Name]:
    return [ast.Name(t) for t in tokens]


def _require_args(tokens, skip: int):
    if len(tokens) <= skip:
        raise SelectError("keyword with no argument", code=SelectError.EMPTY_ARGUMENT)


def _parse_token(string: str) -> ast.Select:
    """reference: parse_token (select/mod.rs:759-886)."""
    if not string.strip():
        raise SelectError("missing argument", code=SelectError.MISSING_ARGUMENT)

    tokens = _split_with_quotes(string)
    if not tokens:
        raise SelectError("empty query", code=SelectError.EMPTY_QUERY)

    head = tokens[0]
    if head == "resname":
        _require_args(tokens, 1)
        return ast.ResidueName(_collect_words(tokens[1:]))
    if head in ("name", "atomname"):
        _require_args(tokens, 1)
        return ast.AtomName(_collect_words(tokens[1:]))
    if head in ("resid", "resnum"):
        _require_args(tokens, 1)
        return ast.ResidueNumber(_fix_ranges(_parse_numbers(tokens[1:])))
    if head == "serial":
        _require_args(tokens, 1)
        return ast.GmxAtomNumber(_fix_ranges(_parse_numbers(tokens[1:])))
    if head == "atomnum":
        _require_args(tokens, 1)
        return ast.AtomNumber(_fix_ranges(_parse_numbers(tokens[1:])))
    if head == "atomid":
        raise SelectError(
            "'atomid' is a deprecated Groan Selection Language keyword; use 'atomnum' instead",
            code=SelectError.DEPRECATED_KEYWORD,
        )
    if head == "chain":
        _require_args(tokens, 1)
        ids = []
        for t in tokens[1:]:
            if len(t) != 1:
                raise SelectError(
                    f"invalid chain identifier '{t}'", code=SelectError.INVALID_CHAIN_ID
                )
            ids.append(t)
        return ast.Chain(ids)
    if head == "group":
        _require_args(tokens, 1)
        return ast.GroupName(_collect_words(tokens[1:]))
    if head == "label":
        _require_args(tokens, 1)
        return ast.LabeledAtom(_collect_words(tokens[1:]))
    if head == "element" and len(tokens) >= 2 and tokens[1] == "name":
        _require_args(tokens, 2)
        return ast.ElementName(_collect_words(tokens[2:]))
    if head == "elname":
        _require_args(tokens, 1)
        return ast.ElementName(_collect_words(tokens[1:]))
    if head == "element" and len(tokens) >= 2 and tokens[1] == "symbol":
        _require_args(tokens, 2)
        return ast.ElementSymbol(_collect_words(tokens[2:]))
    if head == "elsymbol":
        _require_args(tokens, 1)
        return ast.ElementSymbol(_collect_words(tokens[1:]))

    # bare tokens are group names (reference: select/mod.rs:884)
    return ast.GroupName(_collect_words(tokens))


# ---------------------------------------------------------------- numbers
_USIZE_MAX = 2**63 - 1  # practical stand-in for usize::MAX


def _str2number(s: str) -> int:
    try:
        v = int(s)
    except ValueError:
        raise SelectError(f"invalid number '{s}'", code=SelectError.INVALID_NUMBER) from None
    if v < 0:
        raise SelectError(f"invalid number '{s}'", code=SelectError.INVALID_NUMBER)
    return v


def _tokenize_numbers(tokens) -> list:
    """reference: numbers.rs tokenize_numbers."""
    out = []
    current = ""
    joined = " ".join(tokens)
    for ch in joined:
        if ch == "-":
            if current:
                out.append(("num", _str2number(current)))
                current = ""
            out.append(("range",))
        elif ch in "<>":
            if current:
                out.append(("num", _str2number(current)))
                current = ""
            current = ch
        elif ch == "=":
            if not current:
                raise SelectError("stray '='", code=SelectError.INVALID_NUMBER)
            current += ch
            if current == ">=":
                out.append(("ge",))
            elif current == "<=":
                out.append(("le",))
            else:
                raise SelectError(f"invalid token '{current}'", code=SelectError.INVALID_NUMBER)
            current = ""
        elif ch.isspace():
            if current:
                if current == ">":
                    out.append(("gt",))
                elif current == "<":
                    out.append(("lt",))
                else:
                    out.append(("num", _str2number(current)))
                current = ""
        elif ch.isdigit():
            if current == ">":
                out.append(("gt",))
                current = ""
            elif current == "<":
                out.append(("lt",))
                current = ""
            current += ch
        else:
            raise SelectError(f"invalid character '{ch}' in number", code=SelectError.INVALID_NUMBER)
    if current:
        if current in (">", "<"):
            raise SelectError("trailing comparison operator", code=SelectError.INVALID_NUMBER)
        out.append(("num", _str2number(current)))
    return out


def _parse_numbers(tokens) -> list[tuple[int, int]]:
    """reference: numbers.rs parse_numbers."""
    toks = _tokenize_numbers(tokens)
    numbers = []
    t = 0
    while t < len(toks):
        tok = toks[t]
        kind = tok[0]
        if kind == "num":
            if t + 1 < len(toks) and toks[t + 1][0] == "range":
                t += 1
                continue
            numbers.append((tok[1], tok[1]))
            t += 1
        elif kind == "range":
            if t == 0 or t + 1 == len(toks):
                raise SelectError("dangling range operator", code=SelectError.INVALID_NUMBER)
            if toks[t - 1][0] != "num" or toks[t + 1][0] != "num":
                raise SelectError("range endpoints must be numbers", code=SelectError.INVALID_NUMBER)
            prev, nxt = toks[t - 1][1], toks[t + 1][1]
            if prev > nxt:
                raise SelectError("range start exceeds end", code=SelectError.INVALID_NUMBER)
            numbers.append((prev, nxt))
            t += 2
        else:
            if t + 1 == len(toks) or toks[t + 1][0] != "num":
                raise SelectError("comparison operator without number", code=SelectError.INVALID_NUMBER)
            nxt = toks[t + 1][1]
            if kind == "gt":
                numbers.append((nxt + 1, _USIZE_MAX))
            elif kind == "ge":
                numbers.append((nxt, _USIZE_MAX))
            elif kind == "lt":
                if nxt > 1:
                    numbers.append((1, nxt - 1))
            elif kind == "le":
                numbers.append((1, nxt))
            t += 2
    return numbers


def _fix_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + merge overlapping/adjacent ranges (reference: fix_ranges,
    select/mod.rs:888)."""
    if not ranges:
        return ranges
    ranges = sorted(r for r in ranges if r[0] <= r[1])
    if not ranges:
        return []
    merged = [list(ranges[0])]
    for s, e in ranges[1:]:
        if s <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [tuple(m) for m in merged]
