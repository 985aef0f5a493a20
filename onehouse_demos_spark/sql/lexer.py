"""Minimal SQL lexer for the DML front-end (sql/engine.py).

The engine's statement grammar is a set of ANCHORED clause patterns
(UPDATE ... SET ... WHERE, MERGE ... WHEN ... THEN, TBLPROPERTIES
k=v, ...) whose *expressions* are delegated verbatim to Spark SQL.
The one thing a regex can't do safely is ignore keywords and
separators that appear INSIDE string literals and quoted identifiers
(`WHERE` in a value string, a column named `` `where` ``, commas in
'x,y').

This lexer solves that with a **literal mask**: `mask_literals`
returns a SAME-LENGTH copy of the statement where the contents of
every ``'...'`` / ``"..."`` string and every `` `...` `` identifier
are replaced by filler word-characters (quote characters preserved).
Clause patterns run against the masked text — where no keyword can
hide inside a literal — and every captured fragment is sliced from
the ORIGINAL text by match span, so expressions reach Spark SQL
byte-exact. ``match_masked`` / ``finditer_masked`` / ``sub_masked``
wrap the three regex operations the engine uses;
``split_top_level`` / ``split_once_top_level`` are the
separator-splits, literal- and paren-aware.

Escapes handled the way Spark's own lexer does: doubled quotes
(``''``, ``""``, ``` `` ```) and backslash escapes inside string
literals.
"""

from __future__ import annotations

import re

#: filler for masked literal contents: a word character, so masked
#: quoted identifiers still match name patterns like ``[\w.`]+``.
_FILL = "x"


def mask_literals(s: str) -> str:
    """Same-length copy of `s` with string/quoted-identifier contents
    replaced by filler. Quote characters themselves are preserved, so
    the masked text has identical structure and every regex span maps
    1:1 onto the original. `--` line comments and `/* */` block
    comments are masked too (a quote inside a comment must not open a
    phantom literal that swallows the rest of the statement)."""
    out = list(s)
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "-" and i + 1 < n and s[i + 1] == "-":
            while i < n and s[i] != "\n":
                out[i] = _FILL
                i += 1
        elif ch == "/" and i + 1 < n and s[i + 1] == "*":
            out[i] = out[i + 1] = _FILL
            i += 2
            while i < n:
                if s[i] == "*" and i + 1 < n and s[i + 1] == "/":
                    out[i] = out[i + 1] = _FILL
                    i += 2
                    break
                out[i] = _FILL
                i += 1
        elif ch in ("'", '"', "`"):
            q = ch
            i += 1
            while i < n:
                c = s[i]
                if c == "\\" and q != "`" and i + 1 < n:
                    out[i] = _FILL
                    out[i + 1] = _FILL
                    i += 2
                    continue
                if c == q:
                    if i + 1 < n and s[i + 1] == q:  # doubled-quote escape
                        out[i] = _FILL
                        out[i + 1] = _FILL
                        i += 2
                        continue
                    i += 1
                    break
                out[i] = _FILL
                i += 1
        else:
            i += 1
    return "".join(out)


class MaskedMatch:
    """A regex match computed on masked text whose groups slice the
    ORIGINAL text — drop-in for `re.Match` for the methods the engine
    uses (`group`, `start`, `end`, `span`)."""

    def __init__(self, m: re.Match, original: str):
        self._m = m
        self._s = original

    def group(self, *args):
        if not args:
            args = (0,)
        vals = []
        for g in args:
            a, b = self._m.span(g)
            vals.append(None if a == -1 else self._s[a:b])
        return vals[0] if len(vals) == 1 else tuple(vals)

    def start(self, g=0) -> int:
        return self._m.start(g)

    def end(self, g=0) -> int:
        return self._m.end(g)

    def span(self, g=0) -> tuple[int, int]:
        return self._m.span(g)


def match_masked(rx: re.Pattern, s: str) -> MaskedMatch | None:
    m = rx.match(mask_literals(s))
    return MaskedMatch(m, s) if m else None


def finditer_masked(rx: re.Pattern, s: str) -> list[MaskedMatch]:
    return [MaskedMatch(m, s) for m in rx.finditer(mask_literals(s))]


def sub_masked(rx: re.Pattern, repl, s: str) -> str:
    """`re.sub` that never rewrites inside literals: matches are found
    on the masked text, replacements are applied to the original.
    `repl` may be a template string (backrefs resolve against the
    ORIGINAL text) or a callable receiving a MaskedMatch."""
    out = []
    last = 0
    for m in rx.finditer(mask_literals(s)):
        out.append(s[last : m.start()])
        if callable(repl):
            out.append(repl(MaskedMatch(m, s)))
        else:
            out.append(m.expand(repl) if "\\" not in repl else _expand(m, repl, s))
        last = m.end()
    out.append(s[last:])
    return "".join(out)


def _expand(m: re.Match, template: str, original: str) -> str:
    """Backref expansion against the original text."""

    def rep(t: re.Match) -> str:
        g = int(t.group(1))
        a, b = m.span(g)
        return "" if a == -1 else original[a:b]

    return re.sub(r"\\(\d+)", rep, template)


def split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on single-char `sep` only at paren depth 0 and outside
    every kind of literal. Empty/whitespace-only fragments dropped."""
    masked = mask_literals(s)
    parts: list[str] = []
    depth = 0
    last = 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return [p for p in parts if p.strip()]


def split_once_top_level(s: str, sep: str = "=") -> tuple[str, str] | None:
    """Split at the FIRST top-level occurrence of `sep` (assignment
    parsing: a '=' inside a value string or a quoted identifier never
    splits)."""
    masked = mask_literals(s)
    depth = 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            return s[:i], s[i + 1 :]
    return None


def strip_comments(s: str) -> str:
    """Remove `--` line comments and `/* */` block comments — never
    inside literals, whose contents copy through verbatim. The SQL
    engine strips comments BEFORE clause dispatch so an anchored
    grammar's `$` still lands after a trailing comment; expression
    fragments consequently reach Spark comment-free, which parses
    identically. Each stripped comment is replaced by ONE space so
    adjacent tokens never glue together ('1/*c*/WHERE' -> '1 WHERE'
    — a comment is a token separator in SQL, same as whitespace)."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "-" and s[i : i + 2] == "--":
            while i < n and s[i] != "\n":
                i += 1
            out.append(" ")
        elif ch == "/" and s[i : i + 2] == "/*":
            i += 2
            while i < n and s[i : i + 2] != "*/":
                i += 1
            i = min(i + 2, n)
            out.append(" ")
        elif ch in ("'", '"', "`"):
            q = ch
            out.append(ch)
            i += 1
            while i < n:
                c = s[i]
                if c == "\\" and q != "`" and i + 1 < n:
                    out.append(s[i : i + 2])
                    i += 2
                    continue
                out.append(c)
                i += 1
                if c == q:
                    if i < n and s[i] == q:  # doubled-quote escape
                        out.append(s[i])
                        i += 1
                        continue
                    break
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def strip_ident_quotes(name: str) -> str:
    """``` `db`.`my table` ``` → ``db.my table``: strip backticks per
    dot-part (dots inside backticks don't split — they're masked)."""
    parts = split_top_level(name, sep=".")
    out = []
    for p in parts:
        p = p.strip()
        if p.startswith("`") and p.endswith("`") and len(p) >= 2:
            p = p[1:-1].replace("``", "`")
        out.append(p)
    return ".".join(out)
