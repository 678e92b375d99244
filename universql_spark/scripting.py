"""Snowflake Scripting: anonymous blocks interpreted over the engine.

Reference surface: Snowflake procedural blocks (the reference proxies them
to Snowflake wholesale — its local DuckDB path cannot run them at all).
Supported subset, which covers the anonymous-block shapes clients actually
send (setup scripts, conditional DML, loops over a fixed range):

    [DECLARE name [type] [DEFAULT expr]; ...]
    BEGIN
      LET x := <expr>;            -- or plain  x := <expr>;
      IF (<cond>) THEN ... [ELSEIF (<cond>) THEN ...] [ELSE ...] END IF;
      FOR i IN <a> TO <b> DO ... END FOR;
      <any SQL statement>;        -- :var binds substitute as literals
      RETURN <expr>;
    END

plus `EXECUTE IMMEDIATE '<sql or block>'` / `$$ ... $$`. IF/ELSEIF
conditions must be parenthesized (every Snowflake doc example is), which
is what lets the parser skip them without scanning their contents.

Design: a cursor-based recursive parser reads the block statement by
statement (quote-aware; a statement runs to the next ';', so CASE..END
and IFF() inside SQL are never mistaken for control flow). Expressions
evaluate by substituting declared variables as literals into a one-row
SELECT through the engine's dialect layer — every Snowflake function
works in conditions; embedded SQL statements run through
Engine._execute_one with `:var` binds substituted. Control flow is
driver-side (it is in Snowflake too); the data work stays in Spark.
"""

from __future__ import annotations

import re
from typing import Any

_BLOCK_RE = re.compile(r"^\s*(?:DECLARE\b|BEGIN\b)", re.I)
_EXEC_IMM_RE = re.compile(
    r"^\s*EXECUTE\s+IMMEDIATE\s+(?:(\$\$)(?P<dq>.*?)\$\$|'(?P<sq>(?:[^']|'')*)')\s*;?\s*$",
    re.I | re.S,
)
_DECL_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)(?:\s+(?!DEFAULT\b)[A-Za-z_][\w()., ]*?)?(?:\s+DEFAULT\s+(.*))?\s*$",
    re.I | re.S,
)
_ASSIGN_RE = re.compile(r"^\s*(?:LET\s+)?([A-Za-z_]\w*)\s*:=\s*(.*)$", re.I | re.S)


class ScriptError(ValueError):
    pass


class _Return(Exception):
    def __init__(self, value: Any):
        self.value = value


def is_script(sql: str) -> bool:
    if re.match(r"^\s*DECLARE\b", sql, re.I):
        return True
    if re.match(r"^\s*BEGIN\b", sql, re.I):
        # a bare BEGIN [TRANSACTION|WORK] is the txn statement, not a block
        return not re.match(r"^\s*BEGIN\s*(?:TRANSACTION|WORK)?\s*;?\s*$", sql, re.I)
    return bool(_EXEC_IMM_RE.match(sql))


class _Cursor:
    def __init__(self, text: str):
        self.t = text
        self.i = 0

    def skip_ws(self) -> None:
        while self.i < len(self.t) and self.t[self.i].isspace():
            self.i += 1

    def eof(self) -> bool:
        self.skip_ws()
        return self.i >= len(self.t)

    def peek_kw(self, *kws: str) -> str | None:
        """If one of the (space-normalized) keywords is next, return it
        WITHOUT consuming."""
        self.skip_ws()
        for kw in kws:
            pat = r"\s+".join(map(re.escape, kw.split())) + r"\b"
            if re.match(pat, self.t[self.i :], re.I):
                return kw
        return None

    def take_kw(self, *kws: str) -> str | None:
        self.skip_ws()
        for kw in kws:
            pat = r"\s+".join(map(re.escape, kw.split())) + r"\b"
            m = re.match(pat, self.t[self.i :], re.I)
            if m:
                self.i += m.end()
                return kw
        return None

    def take_paren(self) -> str:
        """Consume a parenthesized group, return its inner text."""
        self.skip_ws()
        if self.i >= len(self.t) or self.t[self.i] != "(":
            raise ScriptError(f"expected '(' at: {self.t[self.i:self.i+40]!r}")
        depth, j, n = 0, self.i, len(self.t)
        in_s = False
        while j < n:
            ch = self.t[j]
            if in_s:
                if ch == "'":
                    in_s = False
            elif ch == "'":
                in_s = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    inner = self.t[self.i + 1 : j]
                    self.i = j + 1
                    return inner
            j += 1
        raise ScriptError("unbalanced parentheses")

    def take_until_semicolon(self) -> str:
        """Consume one plain statement up to the next top-level ';'
        (quote- and paren-aware); the ';' is consumed too."""
        self.skip_ws()
        start = self.i
        depth, n = 0, len(self.t)
        in_s = False
        while self.i < n:
            ch = self.t[self.i]
            if in_s:
                if ch == "'":
                    in_s = False
            elif ch == "'":
                in_s = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == ";" and depth == 0:
                out = self.t[start : self.i]
                self.i += 1
                return out
            self.i += 1
        out = self.t[start:]
        return out

    def take_expr_until(self, *stop_kws: str) -> str:
        """Consume expression text until one of the stop keywords appears
        at paren depth 0 (outside strings). The keyword is NOT consumed."""
        self.skip_ws()
        start = self.i
        depth, n = 0, len(self.t)
        in_s = False
        while self.i < n:
            ch = self.t[self.i]
            if in_s:
                if ch == "'":
                    in_s = False
            elif ch == "'":
                in_s = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and (ch.isalpha() or ch == "_"):
                prev = self.t[self.i - 1] if self.i else " "
                if not (prev.isalnum() or prev == "_"):
                    for kw in stop_kws:
                        pat = r"\s+".join(map(re.escape, kw.split())) + r"\b"
                        if re.match(pat, self.t[self.i :], re.I):
                            return self.t[start : self.i]
            self.i += 1
        raise ScriptError(f"expected one of {stop_kws}")


class ScriptRunner:
    def __init__(self, engine):
        self.engine = engine
        self.vars: dict[str, Any] = {}

    # -- substitution / evaluation ----------------------------------------
    def _substitute(self, text: str, bare: bool) -> str:
        spans = [m.span() for m in re.finditer(r"'(?:[^']|'')*'", text)]

        def outside(pos: int) -> bool:
            return not any(a <= pos < b for a, b in spans)

        def colon_sub(m: re.Match) -> str:
            name = m.group(1).lower()
            if name in self.vars and outside(m.start()):
                return self.engine._render_literal(self.vars[name])
            return m.group(0)

        text = re.sub(r":([A-Za-z_]\w*)", colon_sub, text)
        if bare:
            spans = [m.span() for m in re.finditer(r"'(?:[^']|'')*'", text)]

            def bare_sub(m: re.Match) -> str:
                name = m.group(0).lower()
                if name in self.vars and outside(m.start()):
                    return self.engine._render_literal(self.vars[name])
                return m.group(0)

            text = re.sub(r"\b[A-Za-z_]\w*\b", bare_sub, text)
        return text

    def _eval(self, expr: str) -> Any:
        from universql_spark.dialect import snowflake_to_spark  # noqa: PLC0415

        sub = self._substitute(expr.strip(), bare=True)
        row = self.engine.spark.sql(snowflake_to_spark(f"SELECT ({sub}) AS v")).collect()[0]
        return row.v

    # -- recursive statement-list execution --------------------------------
    def _run_block(self, cur: _Cursor, stop_kws: tuple[str, ...]) -> str | None:
        """Execute statements until EOF or one of stop_kws; returns the
        stop keyword seen (consumed) or None at EOF."""
        while not cur.eof():
            kw = cur.take_kw(*stop_kws) if stop_kws else None
            if kw:
                return kw
            self._run_statement(cur)
        return None

    def _skip_block(self, cur: _Cursor, stop_kws: tuple[str, ...]) -> str:
        """Parse-but-don't-execute until one of stop_kws (consumed)."""
        while not cur.eof():
            kw = cur.take_kw(*stop_kws)
            if kw:
                return kw
            self._parse_statement(cur, execute=False)
        raise ScriptError(f"expected one of {stop_kws}")

    def _run_statement(self, cur: _Cursor) -> None:
        self._parse_statement(cur, execute=True)

    def _parse_statement(self, cur: _Cursor, execute: bool) -> None:
        if cur.take_kw("RETURN"):
            expr = cur.take_until_semicolon()
            if execute:
                raise _Return(self._eval(expr))
            return
        if cur.take_kw("IF"):
            return self._if(cur, execute)
        if cur.take_kw("FOR"):
            return self._for(cur, execute)
        if cur.take_kw("BEGIN"):
            stop = ("END",)
            if execute:
                self._run_block(cur, stop)
            else:
                self._skip_block(cur, stop)
            self._consume_semicolon(cur)
            return
        stmt = cur.take_until_semicolon()
        if not execute or not stmt.strip():
            return
        am = _ASSIGN_RE.match(stmt)
        if am:
            self.vars[am.group(1).lower()] = self._eval(am.group(2))
            return
        self.engine._execute_one(self._substitute(stmt, bare=False))

    def _if(self, cur: _Cursor, execute: bool) -> None:
        cond = cur.take_paren()
        if not cur.take_kw("THEN"):
            raise ScriptError("IF without THEN")
        taken = False
        run_this = execute and bool(self._eval(cond)) if execute else False
        taken = run_this
        while True:
            stop = ("ELSEIF", "ELSE", "END IF")
            kw = self._run_block(cur, stop) if run_this else self._skip_block(cur, stop)
            if kw == "END IF":
                self._consume_semicolon(cur)
                return
            if kw == "ELSEIF":
                cond = cur.take_paren()
                if not cur.take_kw("THEN"):
                    raise ScriptError("ELSEIF without THEN")
                run_this = execute and not taken and bool(self._eval(cond))
                taken = taken or run_this
            elif kw == "ELSE":
                run_this = execute and not taken
                taken = True

    def _for(self, cur: _Cursor, execute: bool) -> None:
        m = re.match(r"\s*([A-Za-z_]\w*)\s+IN\b", cur.t[cur.i :], re.I)
        if not m:
            raise ScriptError("FOR without loop variable")
        var = m.group(1).lower()
        cur.i += m.end()
        lo_expr = cur.take_expr_until("TO")
        cur.take_kw("TO")
        hi_expr = cur.take_expr_until("DO")
        cur.take_kw("DO")
        body_start = cur.i
        self._skip_block(cur, ("END FOR",))
        body_end_kw = cur.i  # position after END FOR
        body_text = cur.t[body_start:body_end_kw]
        body_text = re.sub(r"\bEND\s+FOR\s*$", "", body_text, flags=re.I)
        self._consume_semicolon(cur)
        if not execute:
            return
        lo = int(self._eval(lo_expr))
        hi = int(self._eval(hi_expr))
        for v in range(lo, hi + 1):
            self.vars[var] = v
            sub = _Cursor(body_text)
            self._run_block(sub, ())

    @staticmethod
    def _consume_semicolon(cur: _Cursor) -> None:
        cur.skip_ws()
        if cur.i < len(cur.t) and cur.t[cur.i] == ";":
            cur.i += 1

    # -- entry -------------------------------------------------------------
    def run(self, text: str) -> Any:
        m = _EXEC_IMM_RE.match(text)
        if m:
            inner = m.group("dq") if m.group("dq") is not None else m.group("sq").replace("''", "'")
            if _BLOCK_RE.match(inner):
                return self.run(inner)
            self.engine._execute_one(inner.strip().rstrip(";"))
            return None
        t = text.strip().rstrip(";").strip()
        dm = re.match(r"^DECLARE\b(.*?)\bBEGIN\b(.*)\bEND$", t, re.I | re.S)
        bm = re.match(r"^BEGIN\b(.*)\bEND$", t, re.I | re.S)
        if dm:
            decls, body = dm.group(1), dm.group(2)
        elif bm:
            decls, body = "", bm.group(1)
        else:
            raise ScriptError("not a scripting block (BEGIN ... END expected)")
        for d in [x.strip() for x in decls.split(";") if x.strip()]:
            m2 = _DECL_RE.match(d)
            if not m2:
                raise ScriptError(f"unparseable DECLARE entry: {d!r}")
            name, default = m2.group(1).lower(), m2.group(2)
            self.vars[name] = self._eval(default) if default else None
        try:
            self._run_block(_Cursor(body), ())
        except _Return as r:
            return r.value
        return None
