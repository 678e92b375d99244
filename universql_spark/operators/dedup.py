"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

All four are pure DataFrame pipelines over built-in (JVM/codegen) functions —
no Python in the hot path. Scale behavior, operator by operator:

- exact: one groupBy on a 128-bit content hash; shuffle volume = one hash +
  id per row regardless of document size (project BEFORE the shuffle).
- MinHash+LSH: explode(shingles) -> 1 shuffle keyed by doc to build
  signatures -> band explode -> 1 shuffle keyed by (band, band_hash) for the
  candidate self-join -> exact verify on candidates only. Candidate join is
  the classic band-bucket equi-join, so Catalyst shuffles both sides on the
  same key (co-partitioned); a degenerate bucket (thousands of identical
  docs) is handled by AQE skew-join splitting.
- SimHash: explode(tokens) -> per-doc 64-bit signature via conditional sums
  -> candidate pairs by equal 16-bit chunk (pigeonhole for hamming<=3) ->
  exact hamming verify with bit_count(xor).
- n-gram Jaccard (brute force): O(n^2) pair join — this is the *oracle
  baseline* for the LSH paths, not the scale path; keep it off big inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shingling / tokenizing
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased. split() is JVM-side regex."""
    return F.split(F.lower(F.trim(text)), " +")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string>.

    transform over a 0..len-n sequence keeps everything inside one codegen
    stage (no explode yet — the row count doesn't change here).
    """
    w = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )


def with_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    return docs.select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group rows by md5 of normalized content; keep count + representative.

    Representative = min(id): deterministic survivor selection. The shuffle
    carries only (hash, id) — at 100 TB the payload columns never move.
    """
    h = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        docs.select(h.alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# exact pairwise n-gram Jaccard (oracle baseline)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs with n-gram-set Jaccard >= threshold, by brute-force join.

    Output: (id_a, id_b, jac) with id_a < id_b, jac rounded to 4 decimals
    (size ratios of int sets — exact in double, rounding is cosmetic-safe).
    O(n^2): use ONLY as correctness baseline / on blocked subsets.
    """
    a = with_shingles(docs, text_col, id_col, n).select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = with_shingles(docs, text_col, id_col, n).select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(doc_shingles: DataFrame, num_perm: int = 128) -> DataFrame:
    """(id, sh array) -> (id, h0..h{num_perm-1}) minhash signature.

    Permutation i is simulated by seeding xxhash64 with the literal i —
    min(hash_i(shingle)) over the doc's shingles. explode + groupBy(id) is a
    single shuffle keyed by doc id; the num_perm mins fold map-side.
    """
    exploded = doc_shingles.select("id", F.explode("sh").alias("s"))
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"h{i}") for i in range(num_perm)]
    return exploded.groupBy("id").agg(*aggs)


def lsh_candidates(signatures: DataFrame, num_perm: int = 128, bands: int = 32) -> DataFrame:
    """Band the signature and self-join on (band_idx, band_hash).

    rows_per_band r = num_perm/bands; candidate prob for similarity j is
    1-(1-j^r)^b — with r=4, b=32 a pair at j=0.8 is missed w.p. ~4e-8.
    The join key (band_idx, band_hash) co-partitions both sides.
    """
    r = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(*[F.col(f"h{bi * r + j}") for j in range(r)]).alias("bh"),
            )
            for bi in range(bands)
        ]
    )
    banded = signatures.select("id", F.explode(band_structs).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(right, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh")))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates -> exact Jaccard verification.

    Because every candidate is exact-verified, the output equals the
    brute-force jaccard_pairs() result minus LSH false negatives (probability
    ~1e-8 per true pair at these parameters) — which is what lets the DuckDB
    brute-force oracle hash-match this operator.
    """
    sh = with_shingles(docs, text_col, id_col, n)
    sh.cache()  # reused: signature build + verification join
    cands = lsh_candidates(minhash_signatures(sh, num_perm), num_perm, bands)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jac"))
        .filter(F.col("jac") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: per-bit majority vote over token hashes.

    explode(tokens) -> one groupBy(id) with 64 conditional sums (all one
    codegen stage) -> recombine bits. Everything stays JVM-side.
    """
    toks = docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("t"))
    hashed = toks.select("id", F.xxhash64("t").alias("h"))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"v{j}")
        for j in range(64)
    ]
    voted = hashed.groupBy("id").agg(*votes)
    sig = None
    for j in range(64):
        bit = F.when(F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return voted.select("id", sig.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming.

    Pigeonhole blocking: split 64 bits into 4 chunks of 16; any pair within
    hamming<=3 agrees on at least one chunk, so the candidate join is an
    equi-join on (chunk_idx, chunk_value) — never a cross join.
    """
    sig = simhash(docs, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
            )
            for c in range(4)
        ]
    )
    blocked = sig.select("id", "simhash", F.explode(chunks).alias("c")).select(
        "id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.cv").alias("cv")
    )
    l, r = blocked.alias("l"), blocked.alias("r")
    cands = (
        l.join(r, (F.col("l.chunk") == F.col("r.chunk")) & (F.col("l.cv") == F.col("r.cv")))
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cands.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )
