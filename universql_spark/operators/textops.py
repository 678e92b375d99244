"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure built-in-function column expressions
(whole-stage codegen; zero Python in the hot path) designed to be exactly
reproducible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword-count heuristic.
# The classifier is a deterministic argmax — its point is reproducible
# engine semantics, not linguistic accuracy on the synthetic fixture text.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "de", "que", "es"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4"),
}


def occurrence_count(text: Column, word: str) -> Column:
    """Count of whole-word occurrences via replace-length arithmetic.

    (len(padded) - len(replace(padded, ' w ', ''))) / len(' w ') — only
    length/replace/concat, which behave identically in Spark and DuckDB.
    Consecutive marker words are undercounted (shared delimiting space);
    acceptable for a scoring heuristic and — crucially — identical in both
    engines.
    """
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))) / len(needle)


def token_count(text: Column) -> Column:
    """Whitespace token count without split(): count separators + 1."""
    t = F.trim(text)
    squashed = F.regexp_replace(t, " +", " ")
    return F.when(F.length(t) == 0, 0).otherwise(
        F.length(squashed) - F.length(F.replace(squashed, F.lit(" "), F.lit(""))) + 1
    )


def token_count_sql(col: str) -> str:
    """SQL-string twin of token_count for string-expression call sites:
    one F.expr/selectExpr parse instead of ~10 Column-building Py4J round
    trips. Same expression tree after parsing (pinned by
    test_token_count_sql_equals_column), so values are identical."""
    squashed = f"regexp_replace(trim({col}), ' +', ' ')"
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE length({squashed}) - length(replace({squashed}, ' ', '')) + 1 END"
    )


def quality_score(text: Column) -> Column:
    """[0,1] quality heuristic: length band + word-length band + alpha ratio.

    Integer/length arithmetic only -> bit-identical across engines.
    """
    n_chars = F.length(text)
    n_words = token_count(text)
    avg_wlen = (n_chars - n_words + 1) / n_words
    alpha_ratio = F.length(F.regexp_replace(text, "[^a-z ]", "")) / n_chars
    len_ok = F.when((n_chars >= 100) & (n_chars <= 2000), 1.0).otherwise(0.0)
    wlen_ok = F.when((avg_wlen >= 3.0) & (avg_wlen <= 10.0), 1.0).otherwise(0.0)
    return F.round((len_ok + wlen_ok + alpha_ratio) / 3.0, 4)


def lang_score(text: Column, lang: str) -> Column:
    """Stopword-hit score for one language, normalized by token count."""
    total = None
    for w in LANG_MARKERS[lang]:
        c = occurrence_count(text, w)
        total = c if total is None else total + c
    return F.round(total / token_count(text), 6)


def lang_id(text: Column) -> Column:
    """argmax language by marker score; deterministic first-wins tiebreak
    in LANG_MARKERS key order ('und' when every score is 0)."""
    best = F.lit("und")
    best_score = F.lit(0.0)
    # forward order + strict '>' => the FIRST language in LANG_MARKERS order
    # wins ties (later ones only displace on strictly greater score)
    for lang in LANG_MARKERS:
        s = lang_score(text, lang)
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set. Survives word reordering; md5 + binary string sort behave
    identically in Spark and DuckDB."""
    words = F.array_sort(F.array_distinct(F.split(F.lower(F.trim(text)), " +")))
    return F.md5(F.concat_ws(" ", words))


EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"


def pii_scrub(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_urls, redacted_text): count + redact email/URL spans —
    the PII-scrub pass of a training-data pipeline. Pure codegen expressions
    (regexp_extract_all / regexp_replace), no UDF."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), F.lit(0)))
    n_urls = F.size(F.regexp_extract_all(text, F.lit(URL_PATTERN), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]"), URL_PATTERN, "[URL]"
    )
    return n_emails, n_urls, redacted


def repetition_signals(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Gopher-style repetition quality signals per document over word
    2-grams: the fraction of 2-gram occurrences taken by the single most
    frequent 2-gram (top_frac) and the fraction covered by 2-grams that
    occur more than once (dup_frac). High values flag boilerplate /
    machine-generated text in a pretraining-corpus filter (Rae et al. 2021,
    'Scaling Language Models: ... Gopher', table A1 repetition filters).

    Shape at 100 TB: shingle explode -> groupBy(id, gram) -> groupBy(id),
    both with partial aggregation; shuffle rows carry (id, gram-hash-sized
    strings) and counts only, never the document payload.

    -> (doc_id, n_2grams, top_frac, dup_frac, repetitive)
    """
    from universql_spark.operators.dedup import shingle_rows

    grams = shingle_rows(docs, text_col, id_col, n=2)
    per_gram = grams.groupBy("id", "s").agg(F.count("*").alias("cnt"))
    per_doc = per_gram.groupBy("id").agg(
        F.sum("cnt").alias("n_2grams"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup_cnt"),
    )
    top_frac = F.round(F.col("top_cnt") / F.col("n_2grams"), 4)
    dup_frac = F.round(F.col("dup_cnt") / F.col("n_2grams"), 4)
    return per_doc.select(
        F.col("id").alias("doc_id"),
        "n_2grams",
        top_frac.alias("top_frac"),
        dup_frac.alias("dup_frac"),
        (dup_frac >= 0.2).alias("repetitive"),
    )


def compression_ratio(
    docs: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """(id, n_bytes, ratio): zlib-compressed size / raw size per document —
    the cheap repetitiveness signal web-corpus pipelines gate on (highly
    compressible text = boilerplate/repetition; near-1.0 = high-entropy).

    This is a legitimate Pandas-UDF case: no JVM builtin runs a general
    compressor, so the codec runs in Arrow-batched mapInPandas — one Python
    invocation per BATCH, narrow plan (no shuffle), output is 3 scalar
    columns so nothing wide crosses back."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    def kernel(batches):
        import zlib  # noqa: PLC0415

        for pdf in batches:
            raw = pdf["t"].fillna("").str.encode("utf-8")
            n = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n,
                    "ratio": (comp / n.clip(lower=1)).round(4),
                }
            )

    return src.mapInPandas(kernel, "id long, n_bytes long, ratio double")
