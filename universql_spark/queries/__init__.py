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
    # round-3 additions (zero evidence anywhere yet) are inserted here as
    # they land, before the backlog below.
    "fn_syntax_ext", "fn_higher_order", "fn_datetime_parts",
    "corpus_shuffle_deterministic", "dedup_semantic", "text_quality_classifier",
    "fn_object_ops", "text_compression_ratio", "fn_bitwise_ext",
    "dedup_incremental_index", "corpus_train_val_split", "multimodal_audio_chunks",
    "corpus_filter_funnel",
    "dml_schema_evolution", "dedup_substring_spans", "ann_pq_topk",
    "multimodal_resize_meta", "dml_iceberg_upsert_cdc", "text_dsir_weights",
    "fn_hll_mergeable", "dml_iceberg_clone", "dml_stream_changes",
    "dml_insert_multi", "adv_table_function",
    "fn_agg_ext", "fn_stats_ext", "fn_string_ext", "fn_time_slice",
    "win_cond_true_event", "win_change_event", "fn_star_modifiers",
    "text_repetition", "corpus_pack_sequences", "agg_pivot_dynamic",
    "adv_match_recognize", "fn_parse_url", "corpus_domain_stats",
    "dml_iceberg_partitioned", "stream_sliding_sum", "stream_session_counts",
    "join_asof_sql", "text_tokens_bpe",
    "dml_plain_file_granular", "fn_dialect_ext", "fn_array_gallery",
    "fn_datetime_ext", "dedup_decontaminate", "text_pii_scrub",
    "win_ratio_to_report", "stream_view_click_attrib", "adv_connect_by",
    "adv_recursive_cte", "corpus_stratified_sample", "text_quality_percentile", "agg_array_object_agg",
    # round-2 specs with NO sf0.01 evidence (never driver-gated, added after
    # the r1 local gate ran):
    "adv_flatten_recursive", "ann_ivf_topk",
    "tpch_q2_mincost", "tpch_q8_mktshare", "tpch_q9_profit",
    "tpch_q11_important", "tpch_q12_late", "tpch_q13_custdist",
    "tpch_q15_topsupp", "tpch_q16_suppcnt", "tpch_q17_smallqty",
    "tpch_q20_supply", "tpch_q21_waiting", "tpch_q22_opportunity",
    # driver-gated in r1 only, fell off the r2 sample:
    "cb_q41", "cb_q42",
    # local-gate evidence only (r1 local, sf0.01) — never driver-gated;
    # rotate through the driver sample, LLM-pipeline operators first:
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
    "join_full_outer", "subq_correlated", "json_extract", "fn_scalar_gallery",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY), then apply
    the driver-gate rotation order above."""
    from universql_spark.queries import dml  # noqa: F401  (isort: skip)
    from universql_spark.queries import advanced, clickbench, llmops, relational, tpch  # noqa: F401

    order = [n for n in _GATE_PRIORITY if n in REGISTRY] + [
        n for n in REGISTRY if n not in _GATE_PRIORITY
    ]
    reordered = {n: REGISTRY[n] for n in order}
    REGISTRY.clear()
    REGISTRY.update(reordered)
    return REGISTRY
