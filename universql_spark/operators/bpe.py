"""Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") — the tokenizer-training
primitive a large-scale pipeline runs before anything else.

Scale shape (the reason this survives 100 TB): ONE corpus pass builds the
distinct-word frequency histogram (a groupBy shuffle keyed on the word —
the only stage whose input is corpus-sized). Everything after operates on
that histogram, which is VOCABULARY-sized (10^5-10^7 rows at web scale,
regardless of corpus bytes) — exactly how industrial BPE trainers work.
Each merge round is: one vocabulary-wide pair-count aggregation (weighted
by word frequency), a 1-row driver argmax (control plane, like a k-means
centroid collect), and a boundary-anchored regexp_replace applying the
merge greedily left-to-right — all JVM built-ins, no Python UDFs. The
histogram is persisted and re-persisted per round so round r never replays
rounds 0..r-1.

Pair semantics match the reference algorithm: counting sees EVERY adjacent
symbol pair (overlapping repeats count per position); merge application is
greedy leftmost non-overlapping — which is precisely what a
lookaround-anchored regexp_replace does (the scan resumes after each
replacement). Ties on count break (left, right) lexicographic, so training
is deterministic.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, functions as F

#: end-of-word marker symbol (one BPE symbol, never merged into by accident
#: because it cannot appear inside a word's character stream)
EOW = "</w>"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(freq, sym): distinct lowercased whitespace words with corpus counts,
    each rendered as a space-separated character-symbol string + EOW."""
    w = F.explode(F.split(F.lower(F.trim(F.col(text_col))), " +")).alias("w")
    words = docs.select(w).filter(F.col("w") != "").groupBy("w").agg(
        F.count("*").alias("freq")
    )
    # 'a b c </w>' symbol rendering: every char spaced, marker appended
    sym = F.concat(
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), F.lit(" " + EOW)
    )
    return words.select("freq", sym.alias("sym"))


def _adjacent_pairs(hist: DataFrame) -> DataFrame:
    """(l, r, cnt): frequency-weighted adjacent symbol-pair counts."""
    arr = F.split(F.col("sym"), " ")
    pairs = F.arrays_zip(
        F.slice(arr, 1, F.size(arr) - 1).alias("l"),
        F.slice(arr, 2, F.size(arr) - 1).alias("r"),
    )
    return (
        hist.select("freq", F.explode(pairs).alias("p"))
        .select("freq", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
    )


def _java_quote(sym: str) -> str:
    """Literal-quote a symbol for a Java regex (\\Q...\\E handles every
    metacharacter, including the '/' and '<' in the EOW marker)."""
    return "\\Q" + sym.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges; -> (rank, left, right, freq) DataFrame.

    rank is 1-based merge order; freq is the weighted pair count at the
    time the merge was chosen (monotonically useful for vocab truncation).
    """
    spark = docs.sparkSession
    hist = word_histogram(docs, text_col).persist()
    hist.count()  # materialize before the loop so each round starts warm
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                _adjacent_pairs(hist)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
            merges.append((rank, l, r, cnt))
            # greedy leftmost non-overlapping merge, symbol-boundary safe
            pat = f"(?<=^| ){_java_quote(l)} {_java_quote(r)}(?=$| )"
            rep = (l + r).replace("\\", "\\\\").replace("$", "\\$")
            nxt = hist.select(
                "freq", F.regexp_replace(F.col("sym"), pat, rep).alias("sym")
            ).persist()
            nxt.count()
            hist.unpersist()
            hist = nxt
    finally:
        hist.unpersist()
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, freq BIGINT"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply learned merges to a corpus -> (id, n_bpe_tokens): the encode
    side of the tokenizer, as a pure expression pipeline (one regexp per
    merge, in training order — the standard BPE encode semantics for text
    that tokenizes the same way it was trained)."""
    w = F.explode(F.split(F.lower(F.trim(F.col(text_col))), " +")).alias("w")
    tok = docs.select(F.col(id_col).alias("id"), w).filter(F.col("w") != "")
    sym = F.concat(F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), F.lit(" " + EOW))
    out = tok.select("id", sym.alias("sym"))
    for l, r in merges:
        pat = f"(?<=^| ){_java_quote(l)} {_java_quote(r)}(?=$| )"
        rep = (l + r).replace("\\", "\\\\").replace("$", "\\$")
        out = out.select("id", F.regexp_replace(F.col("sym"), pat, rep).alias("sym"))
    n = F.size(F.split(F.col("sym"), " "))
    return out.groupBy("id").agg(F.sum(n).alias("n_bpe_tokens"))
