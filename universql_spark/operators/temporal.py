"""Temporal join operators Spark lacks as primitives: as-of join and
interval/range join helpers.

as-of join (for each left row, the latest right row with right.ts <=
left.ts per key) is implemented with the union + window trick rather than a
pairwise join:

    tag rows (right=0, left=1) -> union -> one window per key ordered by
    (ts, tag) -> last(right payload, ignorenulls) -> keep left rows

This is THE scalable formulation: a single shuffle on the join key, no
range-condition nested-loop join, state bounded by one payload struct per
row. A naive `left join right on key and rts <= lts` + max-window would
materialize every (left, right-before-it) pair — quadratic per key at
100 TB. DuckDB's native ASOF JOIN serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: every left row + the single closest right row per
    key. ``direction='backward'`` (default) takes the most recent right row
    at-or-before the left timestamp (strictly before with ``strict``);
    ``'forward'`` the earliest at-or-after. Right side should be unique per
    (key, ts) — pre-dedup it for deterministic results.

    Output: all left columns + payload columns (null when no matching right
    row). Still ONE shuffle on the key(s): direction flips the window sort,
    strictness flips whether right rows at EQUAL ts sort before or after
    the left row (and are therefore visible to its running last()).
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = payload or [c for c in right.columns if c not in (*keys, right_ts)]
    left_cols = left.columns

    # at equal ts: right sorts BEFORE left (visible) unless strict
    right_tag = 2 if strict else 0
    r = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(keys)],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in left_cols],
    )
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*[f"__k{i}" for i in range(len(keys))])
        .orderBy(ts_order, "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = r.unionByName(l).withColumn("__match", F.last("__p", ignorenulls=True).over(w))
    out = unioned.filter(F.col("__tag") == 1).select(
        *left_cols, *[F.col("__match")[c].alias(c) for c in payload]
    )
    return out


def asof_join_colocated(
    events: DataFrame,
    right_filter,
    left_filter,
    key: str | list[str],
    ts: str = "ts",
    payload: dict[str, "F.Column | str"] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """As-of join where BOTH sides are subsets of ONE table (the common
    event-analytics shape: "for every click, the latest purchase before
    it"). The two-DataFrame asof_join would scan the table twice and union;
    here the tag IS the filter predicate, so the whole join is one scan +
    one window — the minimum possible plan for this shape.

    right_filter / left_filter: boolean Columns selecting the right (lookup)
    and left (probe) rows. payload maps output column name -> source Column
    carried from right rows to the left rows at-or-before semantics
    (right sorts before left at equal ts). Rows matching neither filter are
    dropped at the scan (filter pushdown keeps them out of the shuffle).

    tiebreak: extra ascending sort columns AFTER (ts, tag). Because the
    running last() keeps the final right row seen, a tiebreak like
    ['event_id'] makes equal-(key, ts) right rows resolve to the MAX
    tiebreak value — per-(key, ts) right-side dedup for free, no extra
    window or exchange.
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = payload or {}
    ev = events.filter(right_filter | left_filter)
    tagged = ev.withColumn("__tag", F.when(right_filter, 0).otherwise(1))
    pstruct = F.when(
        F.col("__tag") == 0,
        F.struct(
            *[
                (F.col(c) if isinstance(c, str) else c).alias(n)
                for n, c in payload.items()
            ]
        ),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts, "__tag", *(tiebreak or []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged.withColumn("__match", F.last(pstruct, ignorenulls=True).over(w))
    out = matched.filter(F.col("__tag") == 1)
    for name in payload:
        out = out.withColumn(name, F.col("__match")[name])
    return out.drop("__tag", "__match")


def asof_join_colocated_sql(
    spark,
    table: str,
    right_pred: str,
    left_pred: str,
    key: str | list[str],
    ts: str = "ts",
    payload: dict[str, str] | None = None,
    tiebreak: list[str] | None = None,
    carry: list[str] | None = None,
    select: list[str] | None = None,
) -> DataFrame:
    """SQL-rendered twin of asof_join_colocated for string predicates.

    Same logical plan (tag-filter scan -> one window -> keep left rows),
    built as ONE spark.sql statement: the DataFrame-API construction costs
    ~0.3-0.4 s of per-call Column/plan plumbing at any data size — pure
    fixed overhead a latency-sensitive caller (the bench replan tier, a
    dashboard) shouldn't pay. Predicates/payload are SQL strings here;
    the Column-based variant above remains for programmatic callers.

    carry: source columns the window stage needs (keys/ts/tiebreak are
    added automatically). select: output columns (default: payload names).
    """
    keys = [key] if isinstance(key, str) else list(key)
    payload = payload or {}
    need = list(
        dict.fromkeys(
            (carry or []) + keys + [ts] + (tiebreak or []) + list(payload.values())
        )
    )
    struct_args = ", ".join(f"'{n}', {c}" for n, c in payload.items())
    order = ", ".join([ts, "__tag"] + (tiebreak or []))
    outcols = select or list(payload)
    proj = ", ".join(
        [c for c in outcols if c not in payload]
        + [f"__match.{n} AS {n}" for n in outcols if n in payload]
    )
    return spark.sql(f"""
WITH ev AS (
  SELECT {", ".join(need)},
         CASE WHEN {right_pred} THEN 0 ELSE 1 END AS __tag
  FROM {table}
  WHERE ({right_pred}) OR ({left_pred})
), m AS (
  SELECT {", ".join(need)}, __tag,
         last(CASE WHEN __tag = 0 THEN named_struct({struct_args}) END, true)
           OVER (PARTITION BY {", ".join(keys)} ORDER BY {order}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __match
  FROM ev
)
SELECT {proj} FROM m WHERE __tag = 1""")
