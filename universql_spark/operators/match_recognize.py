"""MATCH_RECOGNIZE: SQL row-pattern matching on Spark.

Reference surface: Snowflake MATCH_RECOGNIZE (the reference proxies it to
Snowflake; its local DuckDB path cannot run it at all — this implementation
makes it a first-class local operator).

Design — hybrid vectorized/NFA, the split the brief prescribes for custom
operators:

1. DEFINE predicates are ordinary column expressions; ``PREV(col[, n])``
   references become ``lag`` window columns. Both evaluate JVM-side in
   whole-stage codegen BEFORE any Python is involved — one shuffle on the
   PARTITION BY key (the window and the grouping share it).
2. Per partition, rows are encoded as one character each: the char's low
   bits are the SET of symbols the row satisfies (a row may satisfy several
   — the standard's nondeterministic-match semantics survive). Each PATTERN
   symbol compiles to the character CLASS of all set-encodings containing
   its bit, so Python's backtracking ``re`` engine performs exact
   leftmost-greedy SQL pattern matching (ONE ROW PER MATCH, AFTER MATCH
   SKIP PAST LAST ROW — ``finditer`` is precisely that skip mode).
3. MEASURES evaluate per match over the matched row slice in pandas:
   FIRST/LAST/MIN/MAX/SUM/COUNT(*)/MATCH_NUMBER().

Scale shape: the only data movement is the one hash shuffle on the
partition key; the Python stage sees (partition, order, symbol-bool,
measure-input) columns only — Arrow-batched via applyInPandas, no
driver collect anywhere. ONE ROW PER MATCH and ALL ROWS PER MATCH (with
RUNNING-semantics measures) are both supported, as are AFTER MATCH SKIP
PAST LAST ROW (default; non-overlapping) and SKIP TO NEXT ROW
(overlapping — the scan resumes one row after the match start). Limits
(raise QueryError): <= 16 symbols, unqualified measure references.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


class MatchRecognizeError(ValueError):
    pass


_SECTION_RE = re.compile(
    r"PARTITION\s+BY\s+(?P<part>.*?)\s+ORDER\s+BY\s+(?P<order>.*?)\s+"
    r"(?:MEASURES\s+(?P<measures>.*?)\s+)?"
    r"(?:(?P<rows>ONE\s+ROW\s+PER\s+MATCH|ALL\s+ROWS\s+PER\s+MATCH)\s+)?"
    r"(?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW)\s+)?"
    r"PATTERN\s*\(\s*(?P<pattern>(?:[^()]|\([^()]*\))*)\s*\)\s*"
    r"DEFINE\s+(?P<define>.*)$",
    re.I | re.S,
)
_PREV_RE = re.compile(r"\bPREV\s*\(\s*([A-Za-z_]\w*)\s*(?:,\s*(\d+)\s*)?\)", re.I)
_MEASURE_RE = re.compile(
    r"^(?:(?P<fn>FIRST|LAST|MIN|MAX|SUM|COUNT)\s*\(\s*(?P<arg>\*|[A-Za-z_]\w*)\s*\)"
    r"|(?P<mn>MATCH_NUMBER\s*\(\s*\)))\s+AS\s+(?P<name>[A-Za-z_]\w*)$",
    re.I,
)
_PATTERN_TOKEN_RE = re.compile(r"[A-Za-z_]\w*|[+*?|(){},^$]|\d+")

#: set-encoding alphabet starts here; 16 symbols -> 65536 chars, all valid
_BASE = 0x100


def _split_top(text: str) -> list[str]:
    parts, depth, buf = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def parse_clause(inner: str) -> dict:
    """The text between MATCH_RECOGNIZE's parens -> parsed sections."""
    m = _SECTION_RE.search(inner.strip())
    if not m:
        raise MatchRecognizeError(
            "MATCH_RECOGNIZE needs PARTITION BY ... ORDER BY ... [MEASURES ...] "
            "PATTERN (...) DEFINE ..."
        )
    all_rows = bool(m.group("rows")) and m.group("rows").upper().startswith("ALL")
    skip_next = bool(m.group("skip")) and "NEXT" in m.group("skip").upper()
    defines: list[tuple[str, str]] = []
    for d in _split_top(m.group("define")):
        dm = re.match(r"([A-Za-z_]\w*)\s+AS\s+(.*)$", d, re.I | re.S)
        if not dm:
            raise MatchRecognizeError(f"unparseable DEFINE entry: {d!r}")
        defines.append((dm.group(1).upper(), dm.group(2).strip()))
    measures: list[tuple[str, str, str]] = []  # (fn, arg, out_name)
    for t in _split_top(m.group("measures") or ""):
        mm = _MEASURE_RE.match(t.strip())
        if not mm:
            raise MatchRecognizeError(
                f"unsupported MEASURES entry {t!r} (FIRST/LAST/MIN/MAX/SUM/"
                f"COUNT(*)/MATCH_NUMBER() AS name)"
            )
        if mm.group("mn"):
            measures.append(("MATCH_NUMBER", "", mm.group("name")))
        else:
            measures.append((mm.group("fn").upper(), mm.group("arg"), mm.group("name")))
    return {
        "partition": [c.strip() for c in m.group("part").split(",")],
        "order": [c.strip() for c in m.group("order").split(",")],
        "measures": measures,
        "pattern": m.group("pattern").strip(),
        "defines": defines,
        "all_rows": all_rows,
        "skip_next": skip_next,
    }


def _compile_pattern(pattern: str, symbols: list[str]) -> str:
    """PATTERN text -> Python regex over set-encoded chars. Each symbol
    becomes the class of all encodings whose bit for that symbol is set."""
    classes: dict[str, str] = {}
    n = len(symbols)
    for i, s in enumerate(symbols):
        chars = [chr(_BASE + mask) for mask in range(1 << n) if mask & (1 << i)]
        classes[s] = "[" + "".join(re.escape(c) for c in chars) + "]"
    out: list[str] = []
    for tok in _PATTERN_TOKEN_RE.findall(pattern):
        up = tok.upper()
        if up in classes:
            out.append(classes[up])
        elif tok in "+*?|(){},^$" or tok.isdigit():
            out.append(tok)
        else:
            raise MatchRecognizeError(f"PATTERN symbol {tok!r} has no DEFINE and is not a quantifier")
    return "".join(out)


def match_recognize(df: DataFrame, inner: str) -> DataFrame:
    """Execute a MATCH_RECOGNIZE clause body against ``df``."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.window import Window  # noqa: PLC0415

    spec = parse_clause(inner)
    part_cols = spec["partition"]
    order_specs: list[tuple[str, bool]] = []
    for o in spec["order"]:
        om = re.match(r"([A-Za-z_]\w*)(?:\s+(ASC|DESC))?$", o.strip(), re.I)
        if not om:
            raise MatchRecognizeError(f"unsupported ORDER BY entry {o!r}")
        order_specs.append((om.group(1), not (om.group(2) or "").upper() == "DESC"))
    order_cols = [c for c, _ in order_specs]
    defined = [s for s, _ in spec["defines"]]
    pattern_syms = [
        t.upper() for t in _PATTERN_TOKEN_RE.findall(spec["pattern"]) if re.match(r"[A-Za-z_]", t)
    ]
    symbols = list(dict.fromkeys(defined + [s for s in pattern_syms if s not in defined]))
    if len(symbols) > 16:
        raise MatchRecognizeError("more than 16 pattern symbols")

    # PREV(col[, n]) -> lag columns computed in the JVM window
    w = Window.partitionBy(*part_cols).orderBy(
        *[F.col(c) if asc else F.col(c).desc() for c, asc in order_specs]
    )
    lags: dict[str, Column] = {}

    def _prev_sub(mm: re.Match) -> str:
        col, n = mm.group(1), int(mm.group(2) or 1)
        name = f"__prev_{col}_{n}"
        lags[name] = F.lag(col, n).over(w)
        return name

    sym_exprs: dict[str, str] = {}
    for s, cond in spec["defines"]:
        sym_exprs[s] = _PREV_RE.sub(_prev_sub, cond)

    staged = df
    for name, col in lags.items():
        staged = staged.withColumn(name, col)
    # symbol membership mask, vectorized: undefined symbols match every row
    mask: Column = F.lit(0)
    for i, s in enumerate(symbols):
        bit = (
            F.when(F.expr(sym_exprs[s]), F.lit(1 << i)).otherwise(F.lit(0))
            if s in sym_exprs
            else F.lit(1 << i)
        )
        mask = mask + bit
    staged = staged.withColumn("__sym_mask", mask)

    rx = re.compile(_compile_pattern(spec["pattern"], symbols))

    # output schema: partition cols keep their input types; measures by form.
    # Column references resolve case-insensitively to the input's spelling.
    in_fields = {f.name.lower(): f for f in staged.schema.fields}
    spec["measures"] = [
        (fn, in_fields[arg.lower()].name if arg and arg != "*" else arg, out)
        for fn, arg, out in spec["measures"]
    ]
    part_cols = [in_fields[c.lower()].name for c in part_cols]
    all_rows = spec["all_rows"]
    skip_next = spec["skip_next"]
    if all_rows:
        # every input column (original spelling, helper cols dropped) plus
        # the measures, Snowflake's ALL ROWS PER MATCH shape
        base_cols = [f.name for f in df.schema.fields]
        fields = [in_fields[c.lower()] for c in base_cols]
    else:
        base_cols = part_cols
        fields = [in_fields[c.lower()] for c in part_cols]
    for fn, arg, out in spec["measures"]:
        if fn in ("COUNT", "MATCH_NUMBER"):
            fields.append(StructField(out, LongType()))
        elif fn == "SUM":
            src = in_fields[arg.lower()].dataType
            fields.append(StructField(out, LongType() if str(src).startswith(("LongType", "IntegerType")) else src))
        else:
            fields.append(StructField(out, in_fields[arg.lower()].dataType))
    schema = StructType(fields)
    measures = spec["measures"]
    out_names = [f.name for f in fields]

    def _measure_row(sl: pd.DataFrame, mn: int, upto: int | None) -> list:
        """Measure values over the match slice; RUNNING semantics when
        ``upto`` is set (ALL ROWS PER MATCH row i sees rows 0..i)."""
        view = sl if upto is None else sl.iloc[: upto + 1]
        out = []
        for fn, arg, _o in measures:
            if fn == "MATCH_NUMBER":
                out.append(mn)
            elif fn == "COUNT":
                out.append(len(view))
            elif fn == "FIRST":
                out.append(view[arg].iloc[0])
            elif fn == "LAST":
                out.append(view[arg].iloc[-1])
            elif fn == "MIN":
                out.append(view[arg].min())
            elif fn == "MAX":
                out.append(view[arg].max())
            elif fn == "SUM":
                out.append(view[arg].sum())
        return out

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            order_cols, ascending=[asc for _, asc in order_specs], kind="mergesort"
        ).reset_index(drop=True)
        s = "".join(chr(_BASE + int(v)) for v in pdf["__sym_mask"])
        rows = []
        mn, pos = 0, 0
        while True:
            m = rx.search(s, pos)
            if m is None:
                break
            if m.start() == m.end():
                pos = m.start() + 1  # zero-length match: no rows, step past
                continue
            mn += 1
            sl = pdf.iloc[m.start() : m.end()]
            if all_rows:
                for i in range(len(sl)):
                    rows.append(
                        [sl[c].iloc[i] for c in base_cols] + _measure_row(sl, mn, i)
                    )
            else:
                rows.append([pdf[c].iloc[0] for c in part_cols] + _measure_row(sl, mn, None))
            # SKIP PAST LAST ROW resumes after the match; SKIP TO NEXT ROW
            # resumes one row after the match START (overlapping matches)
            pos = m.start() + 1 if skip_next else m.end()
        return pd.DataFrame(rows, columns=out_names)

    return staged.groupBy(*part_cols).applyInPandas(one_group, schema=schema)
