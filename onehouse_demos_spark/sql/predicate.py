"""Recursive-descent validator for ON/WHEN/WHERE/SET expressions
(VERDICT r4 ask #7).

The DML front-end (sql/engine.py) delegates expression *evaluation* to
Spark SQL, but clause BOUNDARIES (where an ON condition ends, where a
WHEN clause's condition stops and its action starts) used to be found
by lazy regex over masked text — which mis-splits when a condition
contains nested structures (`CASE WHEN ... THEN ... END` inside an ON
condition, parenthesized boolean groups containing AND). This module
provides:

- ``tokenize``: a literal-aware SQL token stream (built on
  ``lexer.mask_literals`` so keywords inside strings/backticks never
  produce keyword tokens);
- ``validate_expression``: a recursive-descent parse of a scalar /
  boolean expression over that stream. It accepts the expression
  surface the engine's DML statements use (boolean connectives,
  comparisons incl. IS [NOT] NULL / [NOT] IN (list) / [NOT] BETWEEN /
  [NOT] LIKE, arithmetic, function calls, CAST, CASE, qualified and
  backticked identifiers, literals) and raises ``SqlParseError`` with
  the offending position for anything else — most importantly
  SUBQUERIES (`SELECT`/`EXISTS` at any depth), which the engine's
  join-rewrite cannot execute: they must fail loudly at parse time,
  never be silently regex-split into a wrong plan;
- ``find_top_level_keyword`` / ``split_top_level_keyword``: clause
  splitting that is paren- AND CASE/END-aware, so `WHEN`/`THEN`/`AND`
  inside a nested expression never terminate an outer clause.

Reference parity: the MERGE surface these guard is declared by
`spark-sql-nonpartitioned-managed-cow.yaml` (MERGE INTO with
UPDATE/DELETE/INSERT branches) and README.md's spark-sql DML
walkthrough.
"""

from __future__ import annotations

import re

from onehouse_demos_spark.sql.lexer import mask_literals


class SqlParseError(ValueError):
    """A condition/expression the DML grammar cannot represent —
    raised at parse time with the offending token and position."""


_KEYWORDS = {
    "AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN", "LIKE", "RLIKE",
    "TRUE", "FALSE", "CAST", "AS", "CASE", "WHEN", "THEN", "ELSE", "END",
    "SELECT", "DISTINCT", "FROM", "DIV", "INTERVAL",
}
# NOTE: EXISTS is deliberately NOT a keyword — Spark's higher-order
# function `exists(arr, x -> pred)` must parse as an ordinary function
# call. The subquery form `EXISTS (SELECT ...)` is still rejected:
# its argument starts with SELECT, which _no_subquery catches.

#: multi-char operators first so <= tokenizes as one token
_OPS = ["<=>", "<=", ">=", "<>", "!=", "==", "||", "->",
        "=", "<", ">", "+", "-", "*", "/", "%", "(", ")", ",", ".", "[", "]"]

_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM_RE = re.compile(r"(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?[dDlLfF]?")


class Token:
    __slots__ = ("kind", "text", "pos")

    def __init__(self, kind: str, text: str, pos: int):
        self.kind = kind  # KW | IDENT | NUM | STR | OP | EOF
        self.text = text
        self.pos = pos

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Token({self.kind},{self.text!r}@{self.pos})"


def tokenize(s: str) -> list[Token]:
    """Literal-aware token stream: string/backtick contents come from
    the ORIGINAL text (masked text only steers structure), so a
    keyword inside a literal is a STR/IDENT token, never a KW."""
    masked = mask_literals(s)
    out: list[Token] = []
    i, n = 0, len(s)
    while i < n:
        ch = masked[i]
        if ch.isspace():
            i += 1
            continue
        if ch in ("'", '"', "`"):
            q = ch
            j = i + 1
            # mask preserves quote chars and fills contents/escapes, so
            # the next occurrence of q in the mask closes the literal
            while j < n and masked[j] != q:
                j += 1
            if j >= n:
                raise SqlParseError(
                    f"unterminated {q!r} literal starting at position {i}"
                )
            out.append(
                Token("IDENT" if q == "`" else "STR", s[i : j + 1], i)
            )
            i = j + 1
            continue
        m = _NUM_RE.match(masked, i)
        if m and masked[i].isdigit() or (
            m and masked[i] == "." and i + 1 < n and masked[i + 1].isdigit()
        ):
            out.append(Token("NUM", m.group(0), i))
            i = m.end()
            continue
        m = _WORD_RE.match(masked, i)
        if m:
            word = s[m.start() : m.end()]
            kind = "KW" if word.upper() in _KEYWORDS else "IDENT"
            out.append(Token(kind, word, i))
            i = m.end()
            continue
        for op in _OPS:
            if masked.startswith(op, i):
                out.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            raise SqlParseError(
                f"unexpected character {s[i]!r} at position {i} in {s!r}"
            )
    out.append(Token("EOF", "", n))
    return out


class _Parser:
    def __init__(self, tokens: list[Token], source: str):
        self.toks = tokens
        self.i = 0
        self.src = source
        self.case_depth = 0  # open CASE ... END expressions

    # ------------------------------------------------------- plumbing

    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def _err(self, msg: str) -> SqlParseError:
        t = self.cur
        ctx = self.src[max(0, t.pos - 20) : t.pos + 20]
        return SqlParseError(f"{msg} at position {t.pos} (near ...{ctx!r}...)")

    def kw(self, *words: str) -> bool:
        t = self.cur
        return t.kind == "KW" and t.text.upper() in words

    def eat_kw(self, *words: str) -> bool:
        if self.kw(*words):
            self.i += 1
            return True
        return False

    def op(self, *ops: str) -> bool:
        t = self.cur
        return t.kind == "OP" and t.text in ops

    def eat_op(self, *ops: str) -> bool:
        if self.op(*ops):
            self.i += 1
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.eat_op(op):
            raise self._err(f"expected {op!r}, found {self.cur.text!r}")

    def expect_kw(self, word: str) -> None:
        if not self.eat_kw(word):
            raise self._err(f"expected {word}, found {self.cur.text!r}")

    def _no_subquery(self) -> None:
        if self.kw("SELECT"):
            raise self._err(
                "subqueries are not supported in DML conditions — rewrite "
                "the statement with a join (found "
                f"{self.cur.text.upper()!r})"
            )

    # -------------------------------------------------------- grammar

    def parse(self) -> None:
        self.expr()
        if self.cur.kind != "EOF":
            raise self._err(f"unexpected trailing {self.cur.text!r}")

    def expr(self) -> None:
        self.and_expr()
        while self.eat_kw("OR"):
            self.and_expr()

    def and_expr(self) -> None:
        self.not_expr()
        while self.eat_kw("AND"):
            self.not_expr()

    def not_expr(self) -> None:
        while self.eat_kw("NOT"):
            pass
        self.comparison()

    def comparison(self) -> None:
        self.sum()
        if self.eat_op("=", "==", "<>", "!=", "<", "<=", ">", ">=", "<=>"):
            self.sum()
            return
        if self.eat_kw("IS"):
            self.eat_kw("NOT")
            if self.eat_kw("NULL", "TRUE", "FALSE"):
                return
            if self.eat_kw("DISTINCT"):
                self.expect_kw("FROM")
                self.sum()
                return
            raise self._err("expected NULL/TRUE/FALSE/DISTINCT FROM after IS")
        negated = self.eat_kw("NOT")
        if self.eat_kw("LIKE", "RLIKE"):
            self.sum()
            return
        if self.eat_kw("IN"):
            self.expect_op("(")
            self._no_subquery()
            self.expr()
            while self.eat_op(","):
                self.expr()
            self.expect_op(")")
            return
        if self.eat_kw("BETWEEN"):
            self.sum()
            self.expect_kw("AND")
            self.sum()
            return
        if negated:
            raise self._err("expected LIKE/RLIKE/IN/BETWEEN after NOT")

    def sum(self) -> None:
        self.term()
        while self.eat_op("+", "-", "||"):
            self.term()

    def term(self) -> None:
        self.factor()
        while self.op("*", "/", "%") or self.kw("DIV"):
            self.i += 1
            self.factor()

    def factor(self) -> None:
        while self.eat_op("+", "-"):
            pass
        self.atom()
        # postfix: qualified refs t.c, field access f(x).y, array index
        while True:
            if self.eat_op("."):
                if self.cur.kind in ("IDENT", "NUM"):  # a.b, struct.0
                    self.i += 1
                    continue
                raise self._err("expected identifier after '.'")
            if self.eat_op("["):
                self.expr()
                self.expect_op("]")
                continue
            break

    def atom(self) -> None:
        self._no_subquery()
        t = self.cur
        if t.kind in ("NUM", "STR"):
            self.i += 1
            return
        if self.eat_kw("NULL", "TRUE", "FALSE"):
            return
        if self.kw("INTERVAL"):
            self.i += 1
            # INTERVAL '3' DAY / INTERVAL 3 DAYS — literal + unit words
            if self.cur.kind in ("NUM", "STR"):
                self.i += 1
            while self.cur.kind == "IDENT" and _WORD_RE.fullmatch(
                self.cur.text
            ):
                self.i += 1
            return
        if self.kw("CAST"):
            self.i += 1
            self.expect_op("(")
            self.expr()
            self.expect_kw("AS")
            self._typename()
            self.expect_op(")")
            return
        if self.kw("CASE"):
            self.i += 1
            self.case_depth += 1
            if not self.kw("WHEN"):
                self.expr()  # simple CASE operand
            while self.eat_kw("WHEN"):
                self.expr()
                self.expect_kw("THEN")
                self.expr()
            if self.eat_kw("ELSE"):
                self.expr()
            self.expect_kw("END")
            self.case_depth -= 1
            return
        if self.kw("END") and self.case_depth == 0:
            # `end` is non-reserved in Spark: with no CASE open it can
            # only be a column reference, never a CASE terminator.
            self.i += 1
            return
        if t.kind == "IDENT":
            self.i += 1
            if self.eat_op("("):  # function call
                if self.eat_op(")"):
                    return
                self.eat_kw("DISTINCT")
                if self.eat_op("*"):
                    self.expect_op(")")
                    return
                self._lambda_or_expr()
                while self.eat_op(","):
                    self._lambda_or_expr()
                self.expect_op(")")
            return
        if self.eat_op("("):
            self._no_subquery()
            self.expr()
            # (a, b) IN (...) style row-value lists
            while self.eat_op(","):
                self.expr()
            self.expect_op(")")
            return
        if self.eat_op("*"):
            return  # count(*) handled above; bare * in select-lists
        raise self._err(f"unexpected {t.text!r}")

    def _lambda_or_expr(self) -> None:
        """Function-call argument: either a Spark higher-order-function
        lambda (`x -> expr`, `(a, b) -> expr`) or an ordinary expression.
        Lambdas are only legal in argument position, which is the only
        place this is called from."""
        t = self.cur
        nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        if (
            t.kind == "IDENT"
            and nxt is not None
            and nxt.kind == "OP"
            and nxt.text == "->"
        ):
            self.i += 2
            self.expr()
            return
        if self.op("("):
            # lookahead for `( IDENT [, IDENT]* ) ->`
            j = self.i + 1
            params_ok = True
            while params_ok:
                if self.toks[j].kind != "IDENT":
                    params_ok = False
                    break
                j += 1
                if self.toks[j].kind == "OP" and self.toks[j].text == ",":
                    j += 1
                    continue
                break
            if (
                params_ok
                and self.toks[j].kind == "OP"
                and self.toks[j].text == ")"
                and self.toks[j + 1].kind == "OP"
                and self.toks[j + 1].text == "->"
            ):
                self.i = j + 2
                self.expr()
                return
        self.expr()

    def _typename(self) -> None:
        if self.cur.kind not in ("IDENT", "KW"):
            raise self._err("expected type name in CAST")
        self.i += 1
        if self.eat_op("("):
            while not self.eat_op(")"):
                if self.cur.kind == "EOF":
                    raise self._err("unterminated CAST type")
                self.i += 1


def validate_expression(s: str, what: str = "expression") -> str:
    """Parse-validate `s`; return it unchanged on success, raise
    SqlParseError (prefixed with `what`) otherwise. The engine calls
    this on every ON/WHEN/WHERE condition and SET/VALUES expression
    BEFORE handing the text to Spark — a malformed or unsupported
    fragment fails with a clear parse error instead of being silently
    mis-split by the clause grammar."""
    if not s or not s.strip():
        raise SqlParseError(f"empty {what}")
    try:
        _Parser(tokenize(s), s).parse()
    except SqlParseError as exc:
        raise SqlParseError(f"in {what}: {exc}") from None
    return s


# --------------------------------------------------- clause splitting


def _keyword_spans(s: str, keyword: str) -> list[int]:
    """Start offsets of `keyword` occurrences at TOP LEVEL: outside
    every literal (masked), at paren depth 0, and outside any
    CASE ... END expression."""
    masked = mask_literals(s)
    kw_re = re.compile(rf"\b{keyword}\b", re.IGNORECASE)
    word_re = re.compile(r"\b(?:CASE|END)\b", re.IGNORECASE)
    events: list[tuple[int, str]] = []
    for i, ch in enumerate(masked):
        if ch == "(":
            events.append((i, "("))
        elif ch == ")":
            events.append((i, ")"))
    for m in word_re.finditer(masked):
        events.append((m.start(), m.group(0).upper()))
    events.sort()
    # Single ordered walk: paren depth clamped at 0, and END only closes
    # an OPEN Case — a bare column named `end` (non-reserved in Spark)
    # must not drive the depth negative and swallow later keywords.
    out = []
    paren = case = 0
    ei = 0
    for m in kw_re.finditer(masked):
        while ei < len(events) and events[ei][0] < m.start():
            ev = events[ei][1]
            if ev == "(":
                paren += 1
            elif ev == ")":
                paren = max(0, paren - 1)
            elif ev == "CASE":
                case += 1
            elif ev == "END" and case > 0:
                case -= 1
            ei += 1
        if paren == 0 and case == 0:
            out.append(m.start())
    return out


def find_top_level_keyword(s: str, keyword: str) -> int:
    """Offset of the first top-level `keyword` in `s`, or -1."""
    spans = _keyword_spans(s, keyword)
    return spans[0] if spans else -1


def split_top_level_keyword(s: str, keyword: str) -> list[str]:
    """Split `s` at every top-level `keyword`; the keyword itself is
    dropped. A leading segment before the first keyword is returned
    first (may be empty)."""
    spans = _keyword_spans(s, keyword)
    if not spans:
        return [s]
    parts = [s[: spans[0]]]
    for a, b in zip(spans, spans[1:] + [None]):
        parts.append(s[a + len(keyword) : b])
    return parts
