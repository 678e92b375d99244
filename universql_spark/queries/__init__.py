"""Query/operator registry — the correctness + bench contract.

Every implemented operator from SURVEY.md §2 registers a :class:`QuerySpec`:
a Spark builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible)
an equivalent ANSI-SQL oracle string for DuckDB. The driver hash-compares the
two at sf0.01; ``bench=True`` specs form the sf0.1 benchmark suite.

Cross-engine determinism conventions (both sides MUST follow these, or the
value-hash comparison turns into FP-noise roulette):

1. **Sums of doubles go through DECIMAL.** Floating-point addition is not
   associative; Spark sums in partition order, DuckDB in its own order, so raw
   ``SUM(double)`` differs in ULPs (and by ~1e-3 absolute at 1e9 magnitude).
   Convention: ``CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`` — the decimal
   sum is exact and order-independent, the final double conversion is a single
   deterministic IEEE rounding. Same for AVG: exact decimal sum cast to double,
   then one double division by the count.
2. **No raw timestamps in output columns.** Spark emits tz-aware (UTC) arrow
   timestamps, DuckDB naive ones — equal instants that compare unequal.
   Output ``CAST(ts AS DATE)`` or an explicitly formatted string.
3. **Every ORDER BY ... LIMIT carries a full deterministic tiebreak** (unique
   key last). Without it, ties at the LIMIT boundary select different row SETS
   per engine, which no order-insensitive compare can fix.
4. **Alias every computed column identically on both sides** — the driver
   sorts columns by NAME before hashing.
5. **No raw array/map/struct OUTPUT columns in oracled specs.** The driver's
   canonicalizer sorts rows with pandas, which cannot hash python lists —
   the spec errors out regardless of value correctness. Emit
   ``TO_JSON(expr)`` on the Spark side and ``to_json(expr)`` on the DuckDB
   side; the JSON text for numeric/string lists is byte-identical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from universql_spark.session import register_testdata


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    bench: bool = False  # include in bench.py sf0.1 suite
    category: str = ""
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Views are session-scoped; re-register only when sf_dir changes.
_registered: dict[int, str] = {}


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    key = id(spark)
    if _registered.get(key) != sf_dir:
        register_testdata(spark, sf_dir)
        _registered[key] = sf_dir


def register(
    name: str,
    oracle: str | None,
    bench: bool = False,
    category: str = "",
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: register a Spark query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_views(spark, sf_dir)
            return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name=name,
            spark=wrapped,
            oracle=oracle,
            bench=bench,
            category=category,
            doc=doc or (fn.__doc__ or ""),
        )
        return wrapped

    return deco


def register_sql(
    name: str,
    sql: str,
    oracle: str | None = None,
    bench: bool = False,
    category: str = "",
    doc: str = "",
) -> None:
    """Register a query whose Spark side is plain Spark SQL.

    ``oracle`` defaults to the same string — most of the inventory is ANSI SQL
    that parses identically in Spark and DuckDB; pass a separate oracle when
    dialects diverge (e.g. timestamp formatting functions).
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.sql(sql)

    fn.__doc__ = doc
    register(name, oracle if oracle is not None else sql, bench=bench, category=category, doc=doc)(fn)


# The driver's correctness gate samples the FIRST 50 oracled specs in
# REGISTRY order. Rotation policy (VERDICT r2 'Next round' #1): specs with no
# sf0.01 driver evidence yet go first — newest additions, then the specs the
# r1/r2 gates never sampled — so every spec accumulates a driver-verified row
# over rounds. The full registry is additionally gated locally each round at
# sf0.01 (tools_correctness_local.py -> CORRECTNESS_LOCAL.json).
_GATE_PRIORITY: list[str] = [
    # ---- round-5 first-50 (VERDICT r4 'Next round' #3): the 63 oracled
    # specs with no driver-green row yet, newest first. fn_fuzzy_scalar_ext
    # leads: its r4 oracle could not execute in DuckDB 1.0.0 (format
    # thousand-separators) — rebuilt from integer parts and re-gated locally.
    "fn_fuzzy_scalar_ext",
    # r4 llmops additions (never sampled):
    "corpus_chunk_overlap", "text_gopher_rules", "dedup_crossdoc_ngrams",
    "embed_quantize_int8", "text_vocab_topk",
    # window / agg / set / join / subquery galleries (local-gate + pytest
    # evidence only):
    "join_full_outer", "subq_correlated", "json_extract", "fn_scalar_gallery",
    "win_rank_dense", "win_running_sum", "win_lag_lead", "win_moving_avg",
    "win_ntile_cume", "win_range_frame", "win_first_last_value",
    "agg_rollup", "agg_cube", "agg_stats", "agg_rollup_grouping_fn",
    "agg_bool", "agg_group_by_all", "agg_pivot_sql", "multi_distinct_agg",
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "join_semi", "join_anti", "join_left_outer", "join_cross_small",
    "join_cte_chain", "join_self_pairs",
    "subq_scalar", "subq_in", "subq_min_cost_supplier",
    "json_object_construct", "array_construct_ops", "types_cast_gallery",
    "select_literal", "func_string_gallery", "func_math_gallery",
    "func_datetime_gallery", "func_split_part",
    "case_insensitive_idents", "distinct_rows", "null_agg_semantics",
    "null_group_keys",
    # ---- end of first-50 ----
    # next tier (round 6): new round-5 specs first, then the last 13
    # never-gated specs.
    "corpus_source_quota", "text_char_entropy", "embed_matryoshka_recall",
    "fn_sketch_seq_collate", "corpus_temperature_mix", "fn_datetime_parts_ext", "fn_regexp_occurrence_ext", "fn_conversion_ext", "dedup_component_histogram", "text_quality_mask",
    "null_join_semantics", "order_by_ordinal", "unpivot_stack",
    "tpch_q1", "tpch_q3", "tpch_q4_semi", "tpch_q5", "tpch_q6",
    "tpch_q7_volume", "tpch_q10_returns", "tpch_q14_promo",
    "tpch_q18_big_orders", "tpch_q19_disjunct",
    # ---- driver-green already (kept for deterministic ordering of the
    # most-load-bearing specs after the rotation tiers) ----
    "fn_higher_order",
    "tpch_q2_mincost", "tpch_q8_mktshare", "tpch_q9_profit",
    "tpch_q11_important", "tpch_q12_late", "tpch_q13_custdist",
    "tpch_q15_topsupp", "tpch_q16_suppcnt", "tpch_q17_smallqty",
    "tpch_q20_supply", "tpch_q21_waiting", "tpch_q22_opportunity",
    "adv_connect_by", "adv_recursive_cte", "corpus_stratified_sample",
    "text_quality_percentile", "agg_array_object_agg", "adv_flatten_recursive",
    "ann_ivf_topk",
    "dedup_exact", "dedup_exact_props", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_embedding", "dedup_components",
    "dedup_pipeline_survivors", "ann_cosine_topk", "ann_cosine_topk_pandas",
    "text_tokens", "text_quality", "text_langid", "text_fingerprint",
    "text_tfidf_topk", "text_lang_stats", "text_lm_score",
    "profile_documents", "quality_constraints", "multimodal_decode_meta",
    "multimodal_audio_meta", "multimodal_frame_sample",
    "stream_tumbling_counts", "corpus_training_mix", "adv_variant_colon_path",
    "win_rank_topn_per_group", "win_sessionize", "win_ignore_nulls_locf",
    "agg_grouping_sets", "agg_listagg_ordered", "agg_min_max_by",
    "cb_q41", "cb_q42",
]


# Rows-only specs (oracle is None) are pinned to the very back of the
# registry order so they never occupy a driver-gate slot (VERDICT r3 #3).
def _rows_only_last(registry: dict[str, "QuerySpec"]) -> list[str]:
    oracled = [n for n, s in registry.items() if s.oracle is not None]
    rows_only = [n for n, s in registry.items() if s.oracle is None]
    return oracled + rows_only


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY), then apply
    the driver-gate rotation order above."""
    from universql_spark.queries import dml  # noqa: F401  (isort: skip)
    from universql_spark.queries import advanced, clickbench, llmops, relational, tpch  # noqa: F401

    order = [n for n in _GATE_PRIORITY if n in REGISTRY] + [
        n for n in REGISTRY if n not in _GATE_PRIORITY
    ]
    ordered = {n: REGISTRY[n] for n in order}
    reordered = {n: ordered[n] for n in _rows_only_last(ordered)}
    REGISTRY.clear()
    REGISTRY.update(reordered)
    return REGISTRY
