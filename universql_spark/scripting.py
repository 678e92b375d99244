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


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


#: runaway-loop backstop for WHILE/LOOP/REPEAT (Snowflake runs until the
#: statement timeout; an interpreter needs a hard floor instead)
MAX_LOOP_ITERATIONS = 1_000_000


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
        #: cursor name -> query text (unopened) or dict(rows=…, pos=…) (open)
        self.cursors: dict[str, Any] = {}
        #: RESULTSET-typed variables -> pa.Table once assigned
        self.resultsets: dict[str, Any] = {}
        #: row-loop variables (FOR rec IN cursor): name -> {col: value}
        self.row_vars: dict[str, dict] = {}

    # -- substitution / evaluation ----------------------------------------
    def _substitute(self, text: str, bare: bool) -> str:
        spans = [m.span() for m in re.finditer(r"'(?:[^']|'')*'", text)]

        def outside(pos: int) -> bool:
            return not any(a <= pos < b for a, b in spans)

        if self.row_vars:
            def row_sub(m: re.Match) -> str:
                rec, col = m.group(1).lower(), m.group(2).lower()
                row = self.row_vars.get(rec)
                if row is not None and outside(m.start()):
                    lowered = {k.lower(): v for k, v in row.items()}
                    if col in lowered:
                        return self.engine._render_literal(lowered[col])
                return m.group(0)

            text = re.sub(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", row_sub, text)
            spans = [m.span() for m in re.finditer(r"'(?:[^']|'')*'", text)]

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
                tm = re.match(r"(?is)^\s*TABLE\s*\(\s*(\w+)\s*\)\s*$", expr)
                if tm and tm.group(1).lower() in self.resultsets:
                    raise _Return(self.resultsets[tm.group(1).lower()])
                raise _Return(self._eval(expr))
            return
        if cur.take_kw("IF"):
            return self._if(cur, execute)
        if cur.take_kw("FOR"):
            return self._for(cur, execute)
        if cur.take_kw("WHILE"):
            return self._while(cur, execute)
        if cur.take_kw("REPEAT"):
            return self._repeat(cur, execute)
        if cur.take_kw("LOOP"):
            return self._loop(cur, execute)
        if cur.peek_kw("CASE"):
            # statement-form CASE only when a WHEN follows at this level
            # (expression CASE inside SQL never starts a statement here)
            save = cur.i
            cur.take_kw("CASE")
            if cur.peek_kw("WHEN") or cur.t[cur.i :].lstrip().startswith("("):
                return self._case(cur, execute)
            cur.i = save
        if cur.take_kw("BREAK", "EXIT"):
            self._consume_semicolon(cur)
            if execute:
                raise _Break()
            return
        if cur.take_kw("CONTINUE", "ITERATE"):
            self._consume_semicolon(cur)
            if execute:
                raise _Continue()
            return
        if cur.take_kw("BEGIN"):
            # Capture the nested block through its MATCHING END so it gets
            # full block semantics — in particular its own EXCEPTION section
            # (ADVICE r5 #1: the streaming _run_block(cur, ("END",)) form let
            # a nested handler leak to the outer split).
            body = self._capture_block(cur)
            if execute:
                self._exec_block_body(body)
            self._consume_semicolon(cur)
            return
        stmt = cur.take_until_semicolon()
        if not execute or not stmt.strip():
            return
        m = re.match(r"(?is)^\s*(?:LET\s+)?(\w+)\s+CURSOR\s+FOR\s+(.*)$", stmt)
        if m:
            self.cursors[m.group(1).lower()] = m.group(2).strip()
            return
        m = re.match(r"(?is)^\s*OPEN\s+(\w+)\s*$", stmt)
        if m and m.group(1).lower() in self.cursors:
            self._open_cursor(m.group(1).lower())
            return
        m = re.match(r"(?is)^\s*FETCH\s+(\w+)\s+INTO\s+(.*)$", stmt)
        if m and m.group(1).lower() in self.cursors:
            name = m.group(1).lower()
            if not isinstance(self.cursors[name], dict):
                self._open_cursor(name)
            state = self.cursors[name]
            targets = [v.strip().lstrip(":").lower() for v in m.group(2).split(",")]
            row = (
                state["rows"][state["pos"]] if state["pos"] < len(state["rows"]) else None
            )
            state["pos"] += 1
            for i, tgt in enumerate(targets):
                self.vars[tgt] = None if row is None else row[list(row.keys())[i]]
            return
        m = re.match(r"(?is)^\s*CLOSE\s+(\w+)\s*$", stmt)
        if m and m.group(1).lower() in self.cursors:
            self.cursors.pop(m.group(1).lower(), None)
            return
        am = _ASSIGN_RE.match(stmt)
        if am:
            name, rhs = am.group(1).lower(), am.group(2)
            if name in self.resultsets:
                q = rhs.strip()
                if q.startswith("(") and q.endswith(")"):
                    q = q[1:-1]
                self.resultsets[name] = self.engine._execute_one(
                    self._substitute(q, bare=False)
                )
                return
            self.vars[name] = self._eval(rhs)
            return
        self.engine._execute_one(self._substitute(stmt, bare=False))

    def _open_cursor(self, name: str) -> None:
        q = self.cursors[name]
        if isinstance(q, dict):
            return
        df = self.engine._run_select(self._substitute(q, bare=False))
        self.cursors[name] = {
            "rows": [r.asDict() for r in df.collect()],
            "pos": 0,
            "query": q,
        }

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

    def _take_body(self, cur: _Cursor, *end_kws: str) -> str:
        """Parse (without executing) up to one of end_kws; return the body
        text with the consumed end keyword stripped."""
        body_start = cur.i
        self._skip_block(cur, end_kws)
        body_text = cur.t[body_start : cur.i]
        pat = "|".join(r"\s+".join(map(re.escape, k.split())) for k in end_kws)
        return re.sub(rf"\b(?:{pat})\s*$", "", body_text, flags=re.I)

    def _run_body(self, body_text: str) -> bool:
        """One loop-body pass. Returns False when a BREAK unwound."""
        try:
            self._run_block(_Cursor(body_text), ())
        except _Break:
            return False
        except _Continue:
            pass
        return True

    def _for(self, cur: _Cursor, execute: bool) -> None:
        m = re.match(r"\s*([A-Za-z_]\w*)\s+IN\b", cur.t[cur.i :], re.I)
        if not m:
            raise ScriptError("FOR without loop variable")
        var = m.group(1).lower()
        cur.i += m.end()
        cur.skip_ws()
        # row-iteration forms: FOR rec IN <cursor> DO / FOR rec IN (SELECT…) DO
        sub_m = re.match(r"^\(", cur.t[cur.i :])
        cur_m = re.match(r"([A-Za-z_]\w*)\s+(DO|LOOP)\b", cur.t[cur.i :], re.I)
        if sub_m or (cur_m and cur_m.group(1).lower() in self.cursors):
            if sub_m:
                query = cur.take_paren()
            else:
                query = None
                cname = cur_m.group(1).lower()
                cur.i += len(cur_m.group(1))
            cur.take_kw("DO", "LOOP")
            body_text = self._take_body(cur, "END FOR", "END LOOP")
            self._consume_semicolon(cur)
            if not execute:
                return
            if query is not None:
                rows = [
                    r.asDict()
                    for r in self.engine._run_select(
                        self._substitute(query, bare=False)
                    ).collect()
                ]
            else:
                self._open_cursor(cname)
                rows = self.cursors[cname]["rows"]
            try:
                for row in rows:
                    self.row_vars[var] = row
                    if not self._run_body(body_text):
                        break
            finally:
                self.row_vars.pop(var, None)
            return
        lo_expr = cur.take_expr_until("TO")
        cur.take_kw("TO")
        hi_expr = cur.take_expr_until("DO")
        cur.take_kw("DO")
        body_text = self._take_body(cur, "END FOR")
        self._consume_semicolon(cur)
        if not execute:
            return
        lo = int(self._eval(lo_expr))
        hi = int(self._eval(hi_expr))
        for v in range(lo, hi + 1):
            self.vars[var] = v
            if not self._run_body(body_text):
                break

    def _while(self, cur: _Cursor, execute: bool) -> None:
        cond = cur.take_paren()
        cur.take_kw("DO", "LOOP")
        body_text = self._take_body(cur, "END WHILE", "END LOOP")
        self._consume_semicolon(cur)
        if not execute:
            return
        for _ in range(MAX_LOOP_ITERATIONS):
            if not self._eval(cond):
                return
            if not self._run_body(body_text):
                return
        raise ScriptError("WHILE exceeded MAX_LOOP_ITERATIONS")

    def _repeat(self, cur: _Cursor, execute: bool) -> None:
        body_text = self._take_body(cur, "UNTIL")
        cond = cur.take_paren()
        cur.take_kw("END REPEAT")
        self._consume_semicolon(cur)
        if not execute:
            return
        for _ in range(MAX_LOOP_ITERATIONS):
            if not self._run_body(body_text):
                return
            if self._eval(cond):
                return
        raise ScriptError("REPEAT exceeded MAX_LOOP_ITERATIONS")

    def _loop(self, cur: _Cursor, execute: bool) -> None:
        body_text = self._take_body(cur, "END LOOP")
        self._consume_semicolon(cur)
        if not execute:
            return
        for _ in range(MAX_LOOP_ITERATIONS):
            if not self._run_body(body_text):
                return
        raise ScriptError("LOOP exceeded MAX_LOOP_ITERATIONS (no BREAK reached)")

    def _case(self, cur: _Cursor, execute: bool) -> None:
        """Statement-form CASE: simple (CASE (subject) WHEN v THEN …) and
        searched (CASE WHEN (cond) THEN …); END or END CASE closes."""
        subject = None
        cur.skip_ws()
        if cur.t[cur.i : cur.i + 1] == "(":
            subject = cur.take_paren()
        taken = False
        ends = ("WHEN", "ELSE", "END CASE", "END")
        kw = cur.take_kw(*ends)
        while True:
            if kw in ("END CASE", "END"):
                self._consume_semicolon(cur)
                return
            if kw == "WHEN":
                test = cur.take_expr_until("THEN")
                cur.take_kw("THEN")
                if subject is not None:
                    match_expr = f"({subject}) = ({test})"
                else:
                    match_expr = test
                run_this = execute and not taken and bool(self._eval(match_expr))
                taken = taken or run_this
            else:  # ELSE
                run_this = execute and not taken
                taken = True
            kw = (
                self._run_block(cur, ends) if run_this else self._skip_block(cur, ends)
            )

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
            cm = re.match(r"(?is)^(\w+)\s+CURSOR\s+FOR\s+(.*)$", d)
            if cm:
                self.cursors[cm.group(1).lower()] = cm.group(2).strip()
                continue
            rm = re.match(r"(?is)^(\w+)\s+RESULTSET\s*(?::=\s*\((.*)\))?$", d)
            if rm:
                self.resultsets[rm.group(1).lower()] = (
                    self.engine._execute_one(rm.group(2)) if rm.group(2) else None
                )
                continue
            m2 = _DECL_RE.match(d)
            if not m2:
                raise ScriptError(f"unparseable DECLARE entry: {d!r}")
            name, default = m2.group(1).lower(), m2.group(2)
            self.vars[name] = self._eval(default) if default else None
        try:
            self._exec_block_body(body)
        except _Return as r:
            return r.value
        return None

    def _exec_block_body(self, body: str) -> None:
        """Run one block body: split off ITS exception section, run the
        statements, route failures to the matching handler."""
        body, handlers = self._split_exception(body)
        try:
            self._run_block(_Cursor(body), ())
        except (_Return, ScriptError, _Break, _Continue):
            raise
        except Exception as e:  # noqa: BLE001 - the EXCEPTION section's job
            if handlers is None:
                raise
            # Snowflake's builtin exception variables
            self.vars["sqlerrm"] = str(e)[:512]
            self.vars["sqlcode"] = -20000
            self.vars["sqlstate"] = "P0000"
            self._run_handler(handlers, e)

    @classmethod
    def _capture_block(cls, cur) -> str:
        """Consume a nested block's text (cursor positioned just past its
        BEGIN) through the MATCHING END; return the inner body."""
        text, n = cur.t, len(cur.t)
        start, i, block, depth, in_s = cur.i, cur.i, 0, 0, False
        word_re = re.compile(r"[A-Za-z_]\w*")
        while i < n:
            ch = text[i]
            if in_s:
                if ch == "'":
                    in_s = False
                i += 1
                continue
            if ch == "'":
                in_s = True
                i += 1
                continue
            if ch == "(":
                depth += 1
                i += 1
                continue
            if ch == ")":
                depth -= 1
                i += 1
                continue
            prev = text[i - 1] if i else " "
            if ch.isalpha() and not (prev.isalnum() or prev == "_"):
                m = word_re.match(text, i)
                w = m.group(0).lower()
                i = m.end()
                if depth > 0:
                    continue
                if w == "end":
                    if block == 0:
                        cur.i = i
                        return text[start:m.start()]
                    block -= 1
                    m2 = re.match(r"\s*(if|case|loop|while|repeat|for)\b", text[i:], re.I)
                    if m2:
                        i += m2.end()
                elif w in cls._BLOCK_OPENERS and not re.match(r"\s*\(", text[i:]):
                    block += 1
                continue
            i += 1
        raise ScriptError("unterminated nested BEGIN block")

    #: keywords that open a block closed by a (single) END token
    _BLOCK_OPENERS = frozenset({"begin", "if", "case", "loop", "repeat", "while", "for"})

    @classmethod
    def _split_exception(cls, body: str) -> tuple[str, str | None]:
        """Split the block body at the top-level EXCEPTION keyword — outside
        strings/parens AND outside nested BEGIN/IF/CASE/LOOP/WHILE/REPEAT/FOR
        blocks, so a nested block's own EXCEPTION section stays with that
        block (ADVICE r5 #1). Openers followed by '(' are function calls
        (if(), repeat(), ...), not blocks; an END consumes its optional
        trailing block keyword (END IF / END WHILE / ...)."""
        depth, block, i, n = 0, 0, 0, len(body)
        in_s = False
        word_re = re.compile(r"[A-Za-z_]\w*")
        while i < n:
            ch = body[i]
            if in_s:
                if ch == "'":
                    in_s = False
                i += 1
                continue
            if ch == "'":
                in_s = True
                i += 1
                continue
            if ch == "(":
                depth += 1
                i += 1
                continue
            if ch == ")":
                depth -= 1
                i += 1
                continue
            prev = body[i - 1] if i else " "
            if ch.isalpha() and not (prev.isalnum() or prev == "_"):
                m = word_re.match(body, i)
                w = m.group(0).lower()
                i = m.end()
                if depth > 0:
                    continue
                if w == "end":
                    block = max(0, block - 1)
                    # consume an optional trailing block keyword
                    m2 = re.match(r"\s*(if|case|loop|while|repeat|for)\b", body[i:], re.I)
                    if m2:
                        i += m2.end()
                elif w in cls._BLOCK_OPENERS:
                    # function-call form (if(...), repeat(...)) is not a block
                    if not re.match(r"\s*\(", body[i:]):
                        block += 1
                elif w == "exception" and block == 0:
                    return body[:m.start()], body[i:]
                continue
            i += 1
        return body, None

    def _run_handler(self, handlers: str, exc: Exception) -> None:
        """Run the first handler whose WHEN conditions match the error class
        (ADVICE r5 #2): QueryError -> STATEMENT_ERROR, anything else ->
        EXPRESSION_ERROR; OTHER matches both. A declared-condition-only
        handler list with no match re-raises, like Snowflake."""
        from universql_spark.engine import QueryError

        whens = list(
            re.finditer(
                r"(?is)\bWHEN\s+([A-Za-z_]\w*(?:\s+OR\s+[A-Za-z_]\w*)*)\s+THEN\b",
                handlers,
            )
        )
        if not whens:
            raise ScriptError("EXCEPTION section without WHEN ... THEN")
        klass = "statement_error" if isinstance(exc, QueryError) else "expression_error"
        for idx, w in enumerate(whens):
            conds = {c.strip().lower() for c in re.split(r"(?i)\s+OR\s+", w.group(1))}
            if klass in conds or "other" in conds:
                start = w.end()
                end = whens[idx + 1].start() if idx + 1 < len(whens) else len(handlers)
                self._run_block(_Cursor(handlers[start:end]), ())
                return
        raise exc
