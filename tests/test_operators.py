"""Operator-library unit tests: properties the oracle comparison can't see
(LSH recall, simhash blocking soundness, multimodal batch plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universql_spark.operators import dedup, multimodal, similarity
from universql_spark.session import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_minhash_lsh_equals_bruteforce(docs):
    lsh = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_pairs(docs, threshold=0.8).collect()}
    brute = {(r.id_a, r.id_b) for r in dedup.jaccard_pairs(docs, threshold=0.8).collect()}
    assert lsh == brute
    assert len(brute) > 0, "fixture should contain near-duplicate pairs"


def test_simhash_finds_high_jaccard_pairs(docs):
    sim = {(r.id_a, r.id_b) for r in dedup.simhash_pairs(docs, max_hamming=8).collect()}
    near_identical = {
        (r.id_a, r.id_b) for r in dedup.jaccard_pairs(docs, threshold=0.95).collect()
    }
    missed = near_identical - sim
    assert len(missed) <= max(1, len(near_identical) // 5), (
        f"simhash missed too many near-identical pairs: {missed}"
    )


def test_exact_groups_partition_of_corpus(docs):
    groups = dedup.exact_groups(docs)
    total = groups.agg(F.sum("n_copies")).first()[0]
    assert total == docs.count()


def test_lsh_bucket_recall_vs_bruteforce(emb):
    exact = {(r.id_a, r.id_b) for r in similarity.near_dup_pairs(emb, threshold=0.45).collect()}
    bucketed = {
        (r.id_a, r.id_b)
        for r in similarity.lsh_bucketed_pairs(emb, threshold=0.45, dim=64, bits=4, tables=8).collect()
    }
    assert bucketed <= exact, "bucketed path must be a subset (no false positives)"
    assert len(exact) > 0, "fixture should contain pairs at this threshold"
    recall = len(bucketed) / len(exact)
    assert recall >= 0.5, f"LSH recall collapsed: {recall}"


def test_ivf_pruned_probe_recall(emb):
    """IVF at n_probe=2 of 8 cells searches ~a quarter of the corpus; its
    top-k must still recover most of the exact neighbors (measured 0.86 on
    the fixture; floor leaves headroom, training is deterministic)."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.q_id, r.n_id) for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    approx = {
        (r.q_id, r.n_id)
        for r in similarity.ivf_topk(emb, q, n_cells=8, n_probe=2, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF recall collapsed: {recall}"


def test_brute_force_topk_shape(emb):
    out = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=4).collect()
    assert len(out) == 12
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2, 3, 4]
        cos = [r.cos for r in sorted(rows, key=lambda r: r.rank)]
        assert cos == sorted(cos, reverse=True)
        assert all(r.n_id != q for r in rows)


def test_hamming_topk_matches_numpy(emb):
    """Integer-exact end to end: recompute signatures + distances in numpy
    and assert the full (q_id, n_id, hamming, rank) row set."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    bits = (np.array([r.embedding for r in rows]) >= 0).astype(np.int64)
    got = similarity.hamming_topk(emb, emb.filter(F.col("vec_id") < 3), k=4).collect()
    by_vec = {ids[i]: bits[i] for i in range(len(ids))}
    for q in (0, 1, 2):
        d = {i: int(np.sum(by_vec[q] != b)) for i, b in by_vec.items() if i != q}
        want = sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:4]
        got_q = sorted([r for r in got if r.q_id == q], key=lambda r: r.rank)
        assert [(r.n_id, r.hamming) for r in got_q] == want


def test_hamming_rerank_recall_floor(emb):
    """Two-stage retrieval: reranked top-k must recover a healthy fraction
    of the exact brute-force top-k (64-bit signatures over noisy clustered
    vectors; shortlist 10x k), and its rows must be exact-cosine-consistent
    (each returned cos equals the brute-force cos for that pair)."""
    brute = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)
    two = similarity.hamming_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, shortlist=50
    )
    b = {(r.q_id, r.n_id): r.cos for r in brute.collect()}
    t = {(r.q_id, r.n_id): r.cos for r in two.collect()}
    hits = set(b) & set(t)
    assert len(hits) / len(b) >= 0.4, f"recall collapsed: {len(hits)}/{len(b)}"
    assert all(b[p] == t[p] for p in hits), "rerank cosine must equal exact"


def test_containment_pairs_superset_of_jaccard(docs):
    """containment >= jaccard always, so the jaccard-0.8 pair set embeds in
    the containment-0.8 set; and the hash-keyed path equals brute force."""
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_pairs(docs, threshold=0.8).collect()
    }
    jac = {(r.id_a, r.id_b) for r in dedup.jaccard_pairs(docs, threshold=0.8).collect()}
    assert jac <= set(cont)
    assert all(0.8 <= v <= 1.0 for v in cont.values())


def test_bmp_codec_roundtrip_bytes():
    # pure byte-level: encode a padded-width BMP, decode without Spark
    b = multimodal.encode_bmp(5, 3, 77)  # 5*3=15 bytes/row -> 1 pad byte
    w, h, c, mean = multimodal._decode_bmp(b)
    assert (w, h, c) == (5, 3, 3)
    assert mean == 77.0  # padding stripped — polluted mean would differ


def test_wav_codec_roundtrip_bytes():
    b = multimodal.encode_wav(8000, 1234, 500)
    rate, ch, nf, dur, rms = multimodal._decode_wav(b)
    assert (rate, ch, nf) == (8000, 1, 1234)
    assert abs(dur - 1234 / 8000) < 1e-12
    assert rms == 500.0  # square wave: RMS == amplitude exactly


def test_multimodal_decode_batches(docs):
    media = multimodal.synthesize_bmp_media(docs)
    # simpleString ignores nullability (Spark infers its own nullable flags)
    assert media.schema.simpleString() == multimodal.MEDIA_SCHEMA.simpleString()
    rows = multimodal.decode_images(media).collect()
    assert len(rows) == docs.count()
    assert all(r.format == "bmp" and r.width >= 4 and r.height >= 4 and r.n_channels == 3 for r in rows)
    assert all(r.mean_intensity == float(r.media_id % 256) for r in rows)


def test_multimodal_non_image_payload_is_unknown(docs):
    rows = multimodal.decode_images(multimodal.as_media(docs)).collect()
    assert all(r.format == "unknown" and r.width is None for r in rows)


def test_multimodal_audio_decode(docs):
    rows = multimodal.decode_audio(multimodal.synthesize_wav_media(docs)).collect()
    assert all(r.sample_rate == 8000 and r.n_channels == 1 for r in rows)
    assert all(r.rms == float(r.media_id % 2000 + 1) for r in rows)


def test_multimodal_features_normalized(docs):
    feats = multimodal.extract_features(multimodal.as_media(docs)).collect()
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in feats)
    s = sum(feats[0].features)
    assert abs(s - 1.0) < 1e-3


def test_frame_sample_decodes_sampled_frames(docs):
    media = multimodal.synthesize_ppm_video_media(docs)
    rows = multimodal.frame_sample(media, every_n=2).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for mid, frames in by_id.items():
        n_frames = mid % 4 + 2
        assert sorted(f.frame_no for f in frames) == list(range(0, n_frames, 2))
        for f in frames:
            assert (f.width, f.height) == (mid % 5 + 2, mid % 3 + 2)
            assert f.mean_intensity == float((mid + f.frame_no) % 256)


def test_salted_sum_equals_direct(spark, sf_dir):
    from universql_spark.operators import scale

    ev = load_table(spark, sf_dir, "events")
    salted = scale.salted_sum(
        ev, "event_type", F.expr("CAST(value AS DECIMAL(28,6))"), "total", salt_source="event_id"
    )
    direct = ev.groupBy("event_type").agg(
        F.sum(F.expr("CAST(value AS DECIMAL(28,6))")).alias("total"),
        F.count("*").alias("total_count"),
    )
    got = {(r.event_type, str(r.total), r.total_count) for r in salted.collect()}
    want = {(r.event_type, str(r.total), r.total_count) for r in direct.collect()}
    assert got == want


def test_bucketed_join_no_exchange(spark, sf_dir):
    from universql_spark.operators import scale

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    scale.write_bucketed(orders.select(F.col("o_orderkey").alias("k"), "o_totalprice"), "b_orders", "k")
    scale.write_bucketed(li.select(F.col("l_orderkey").alias("k"), "l_quantity"), "b_lineitem", "k")
    joined = scale.bucketed_join(spark, "b_orders", "b_lineitem", "k", force_sortmerge=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = joined._jdf.queryExecution().explainString(mode)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, "bucketed join must not shuffle"
    assert joined.count() == li.count()
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def test_kmeans_inertia_monotone(emb):
    from universql_spark.operators import cluster

    out, hist = cluster.kmeans(emb, k=8, iters=4)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r.cluster for r in rows} <= set(range(8))
    # Lloyd's algorithm never increases inertia
    assert all(b <= a + 1e-6 for a, b in zip(hist, hist[1:])), hist
    assert hist[-1] < hist[0]


def test_pandas_topk_equals_builtin(emb):
    builtin = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=4).collect()
    vectorized = similarity.brute_force_topk_pandas(emb, emb.filter(F.col("vec_id") < 5), k=4).collect()
    b = {(r.q_id, r.rank): (r.n_id, r.cos) for r in builtin}
    v = {(r.q_id, r.rank): (r.n_id, r.cos) for r in vectorized}
    assert b == v


def test_components_chain_logarithmic_rounds(spark, tmp_path):
    """Large-star/small-star on a chain of diameter 31 must converge in
    O(log d) rounds (plain propagation needs 31) and label every node with
    the chain min — under RELIABLE checkpointing (VERDICT r2 #5)."""
    from universql_spark.operators import components

    n = 32
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    labels, rounds = components.connected_components(
        nodes, edges, checkpoint_dir=str(tmp_path / "ckpt"), with_stats=True
    )
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 8, f"chain d=31 took {rounds} rounds (propagation-like)"
    # reliable checkpoint actually wrote to the configured dir
    import os
    assert any(os.scandir(str(tmp_path / "ckpt")))


def test_components_skewed_hub_and_isolates(spark):
    """A skewed star (one hub, many spokes) plus isolated nodes: hub
    components resolve to the min id, isolates keep their own id."""
    from universql_spark.operators import components

    nodes = spark.range(40).select(F.col("id"))
    # hub node 7 connected to 10..29; separate pair (30, 31); 0..6, 32..39 isolated
    hub = spark.range(10, 30).select(F.lit(7).alias("id_a"), F.col("id").alias("id_b"))
    pair = spark.createDataFrame([(30, 31)], "id_a long, id_b long")
    labels = components.connected_components(nodes, hub.unionAll(pair))
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got[7] == 7 and all(got[i] == 7 for i in range(10, 30))
    assert got[30] == 30 and got[31] == 30
    for i in list(range(7)) + list(range(32, 40)):
        assert got[i] == i


def test_repetition_signals_values(spark):
    from universql_spark.operators.textops import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 5 2-grams: "a b"x3 + "b a"x2 -> all dup
            (2, "w x y z"),              # 3 distinct 2-grams, no dups
            (3, "solo"),                 # single-token doc: one 1-token shingle
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert out[1].n_2grams == 5 and out[1].top_frac == 0.6 and out[1].dup_frac == 1.0
    assert out[1].repetitive
    assert out[2].n_2grams == 3 and out[2].dup_frac == 0.0 and not out[2].repetitive
    assert out[3].n_2grams == 1 and out[3].top_frac == 1.0


def test_pack_sequences_invariants(spark):
    """Every doc lands in exactly one sequence; a sequence exceeds the
    budget only by its final (straddling) document."""
    from pyspark.sql import functions as F

    from universql_spark.operators.scale import pack_sequences

    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 * 10 + 5).alias("n_tokens"),
    )
    budget = 400
    packed = pack_sequences(docs, budget=budget, n_shards=4).collect()
    assert sum(r.n_docs for r in packed) == 200
    max_doc = 36 * 10 + 5
    assert all(r.n_tokens < budget + max_doc for r in packed)
    # deterministic: same input -> identical packing
    again = pack_sequences(docs, budget=budget, n_shards=4).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))


def test_pca_project_matches_numpy(spark, sf_dir):
    """Distributed two-pass PCA == numpy PCA on the same data, exactly
    (deterministic component signs; projections rounded to 6 decimals)."""
    import numpy as np

    from universql_spark.operators.cluster import pca_project
    from universql_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out, comps = pca_project(emb, k=4)
    data = np.array([r.embedding for r in emb.orderBy("vec_id").collect()], dtype=float)
    mean = data.mean(0)
    w, vecs = np.linalg.eigh(np.cov((data - mean).T, bias=True))
    ref = vecs[:, ::-1][:, :4].T.copy()
    for row in ref:
        nz = row[np.abs(row) > 1e-12]
        if len(nz) and nz[0] < 0:
            row *= -1
    proj_ref = np.round((data - mean) @ ref.T, 6)
    got = np.array([r.proj for r in out.orderBy("vec_id").collect()])
    assert np.abs(proj_ref - got).max() == 0.0
    # top components carry descending variance
    variances = got.var(axis=0)
    assert all(variances[i] >= variances[i + 1] - 1e-9 for i in range(3))


def test_duplicate_spans_semantics(spark):
    """Constructed corpus pins the span algebra: cross-doc duplicated runs
    merge into one interval, unique text contributes nothing, and a doc with
    zero duplicated 5-grams is absent from the output."""
    shared = "alpha bravo charlie delta echo foxtrot golf"  # 7 tokens: 3 dup 5-gram positions -> 1 span of 7
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tokens here only once ever seen"),
            (2, "totally different prefix words " + shared),
            (3, "no duplicated grams in this document at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup.duplicate_spans(docs, n=5, min_count=2).collect()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["n_dup_spans"] == 1
        assert out[d]["dup_tokens"] == 7  # the merged run, not 3 overlapping 5-grams
    assert out[1]["total_tokens"] == 14
    # self-repetition inside ONE doc also counts (Lee et al. semantics)
    rep = spark.createDataFrame(
        [(9, "one two three four five xx one two three four five")], ["doc_id", "text"]
    )
    r = dedup.duplicate_spans(rep, n=5, min_count=2).collect()[0]
    # [0,4] and [6,10] — the separator "xx" is NOT duplicated, so the two
    # runs stay distinct spans
    assert r["n_dup_spans"] == 2 and r["dup_tokens"] == 10


def test_pq_lossless_equals_brute_force(spark):
    """When every sub-vector is drawn from <= k_codes patterns that the
    deterministic init enumerates, quantization is lossless and ADC scores
    are bit-identical to exact cosine (integer partial sums) — pq_topk must
    equal brute_force_topk including tiebreaks."""
    import random

    rng = random.Random(7)
    patterns = [[float((p * 7 + i * 3) % 5 + 1) for i in range(4)] for p in range(8)]
    rows = []
    for vid in range(40):
        if vid < 8:  # init coverage: vector v repeats pattern v in all subspaces
            vec = patterns[vid] * 4
        else:
            vec = sum((patterns[rng.randrange(8)] for _ in range(4)), [])
        rows.append((vid, vec))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.filter("vec_id < 6")
    got = similarity.pq_topk(emb, q, m=4, k_codes=8, k=5, rerank=None).collect()
    want = similarity.brute_force_topk(emb, q, k=5).collect()
    assert [(r.q_id, r.n_id, r.cos) for r in got] == [(r.q_id, r.n_id, r.cos) for r in want]


def test_pq_rerank_recall(spark, sf_dir):
    """ADC shortlist + exact re-rank: recall@5 >= 0.6 on the embeddings
    fixture (measured 0.84 at rerank=10 vs 0.2 for raw ADC top-5 — the
    shortlist is doing real work on near-random vectors, the hardest case
    for PQ)."""
    from universql_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter("vec_id < 10")
    exact = {(r.q_id, r.n_id) for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    got = {(r.q_id, r.n_id) for r in similarity.pq_topk(emb, q, k=5, rerank=10).collect()}
    assert len(exact & got) / len(exact) >= 0.6


def test_resize_images_real_bytes(docs):
    """resize -> real BMP bytes at the target dims; constant-intensity
    sources keep their exact mean through nearest-neighbor + re-encode, and
    non-image payloads come back null instead of failing the batch."""
    media = multimodal.synthesize_bmp_media(docs)
    resized = multimodal.resize_images(media, 8, 6)
    out = multimodal.decode_images(
        resized.select("media_id", "format", "content")
    ).collect()
    assert len(out) == docs.count()
    for r in out:
        assert (r.format, r.width, r.height) == ("bmp", 8, 6)
        assert r.mean_intensity == float(r.media_id % 256)
    # pass-through behavior for non-image payloads
    junk = multimodal.resize_images(multimodal.as_media(docs), 8, 6).collect()
    assert all(r.format == "unknown" and r.content is None for r in junk)


# ---------------------------------------------------------------------------
# SemDeDup + quality classifier (continuation)
# ---------------------------------------------------------------------------

def test_semdedup_k1_equals_brute_force(emb):
    """With one cluster, SemDeDup's within-cluster comparison IS the global
    brute force — pairs and survivors must match exactly."""
    pairs, survivors = similarity.semdedup(emb, k=1, iters=1, threshold=0.45)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    brute = {
        (r.id_a, r.id_b)
        for r in similarity.near_dup_pairs(emb, threshold=0.45).collect()
    }
    assert got == brute and len(brute) > 0
    dropped = {b for (_, b) in brute}
    surv = {r.id for r in survivors.collect()}
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert surv == all_ids - dropped


def test_semdedup_clustered_subset_recall(emb):
    """k>1 pairs are a subset of brute force (never invents a pair) with
    useful recall: near-dups mostly share a k-means cell."""
    pairs, _ = similarity.semdedup(emb, k=4, iters=3, threshold=0.45)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    brute = {
        (r.id_a, r.id_b)
        for r in similarity.near_dup_pairs(emb, threshold=0.45).collect()
    }
    assert got <= brute
    assert len(got) >= 0.6 * len(brute), (
        f"semdedup recall too low: {len(got)}/{len(brute)}"
    )


def test_classifier_deterministic_and_learns(docs):
    """Decimal-exact gradient accumulation -> bit-identical weights under
    any partitioning; the loss must drop and the gate must RANK positives
    above negatives (AUC — a quality gate thresholds at a pacing quantile,
    so ranking separation is the operative property, not 0.5-calibration)."""
    from universql_spark.operators import classifier

    label = F.col("text").contains("spark")
    w1, b1, h1 = classifier.train_quality_classifier(docs, label, dim=128, epochs=5, lr=0.3)
    w2, b2, h2 = classifier.train_quality_classifier(
        docs.repartition(7), label, dim=128, epochs=5, lr=0.3
    )
    assert w1 == w2 and b1 == b2 and h1 == h2
    assert h1[-1] < h1[0], f"loss did not decrease: {h1}"
    scored = classifier.score_documents(docs, w1, b1)
    rows = (
        scored.join(docs.select(F.col("doc_id").alias("id"), label.alias("y")), "id")
        .select("score", "y")
        .collect()
    )
    pos = [r.score for r in rows if r.y]
    neg = [r.score for r in rows if not r.y]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert auc >= 0.9, f"classifier failed to separate: AUC={auc}"


def test_compression_ratio_signal(spark, docs):
    """Repetitive text compresses far better than high-entropy text, and
    every ratio is positive and bounded."""
    from universql_spark.operators import textops

    rows = textops.compression_ratio(docs).collect()
    assert len(rows) == docs.count()
    assert all(0 < r.ratio <= 1.5 for r in rows)
    synth = spark.createDataFrame(
        [(1, "spam " * 400), (2, "".join(chr(33 + (i * 37) % 90) for i in range(2000)))],
        "doc_id long, text string",
    )
    by_id = {r.id: r.ratio for r in textops.compression_ratio(synth).collect()}
    assert by_id[1] < 0.05 < by_id[2]


def test_incremental_dedup_index(spark, docs, tmp_path):
    """Incremental dedup against a persisted Iceberg signature index:
    batch-2 pairs from the index equal the full recompute's pairs that
    touch batch 2 (old-vs-old never recomputed), and the index grows by
    one append snapshot per batch."""
    from universql_spark.iceberg_format import IcebergTable

    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    s1 = dedup.minhash_sig_rows(b1)
    index = IcebergTable.create(str(tmp_path / "ix"), s1)
    s2 = dedup.minhash_sig_rows(b2)
    got = {
        (r.id_a, r.id_b)
        for r in dedup.incremental_minhash_pairs(
            s2, index.read(spark), threshold=0.8
        ).collect()
    }
    index.append(s2)
    assert len(index.snapshots()) == 2  # one append snapshot per batch

    # ground truth: full recompute over everything, keep pairs touching b2
    all_sigs = dedup.minhash_sig_rows(docs)
    full = {
        (r.id_a, r.id_b)
        for r in dedup.incremental_minhash_pairs(all_sigs, None, threshold=0.8).collect()
    }
    b2_ids = {r.doc_id for r in b2.select("doc_id").collect()}
    want = set()
    for x, y in full:
        if x in b2_ids and y in b2_ids:
            want.add((min(x, y), max(x, y)))
        elif x in b2_ids:
            want.add((x, y))
        elif y in b2_ids:
            want.add((y, x))
    norm_got = {(min(a, b), max(a, b)) for a, b in got if a in b2_ids and b in b2_ids}
    norm_got |= {(a, b) for a, b in got if b not in b2_ids}
    norm_want = {(min(a, b), max(a, b)) for a, b in want if a in b2_ids and b in b2_ids}
    norm_want |= {(a, b) for a, b in want if b not in b2_ids}
    assert norm_got == norm_want and len(norm_got) > 0


def test_audio_chunks_cover_file_exactly(docs):
    """Chunks tile each WAV exactly: frames sum to the file's frame count,
    boundaries are contiguous, and a square wave meters RMS == peak ==
    amplitude in every full chunk."""
    media = multimodal.synthesize_wav_media(docs)
    chunks = multimodal.audio_chunks(media, window_sec=0.05).collect()
    meta = {r.media_id: r for r in multimodal.decode_audio(media).collect()}
    by_id = {}
    for r in chunks:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == set(meta)
    for mid, rows in by_id.items():
        rows.sort(key=lambda r: r.chunk_no)
        assert sum(r.n_frames for r in rows) == meta[mid].n_frames
        assert [r.chunk_no for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert abs(a.end_sec - b.start_sec) < 1e-9
        amp = float(mid % 2000 + 1)
        full = [r for r in rows if r.n_frames == rows[0].n_frames]
        assert all(abs(r.rms - amp) < 1e-9 and r.peak == amp for r in full[:3])


def test_score_expr_equals_scored(docs):
    """The shuffle-free expression scorer must equal the aggregation-based
    score_documents for presence features (same hashing, same weights)."""
    from universql_spark.operators import classifier

    label = F.col("text").contains("spark")
    w, b, _ = classifier.train_quality_classifier(docs, label, dim=64, epochs=2, lr=0.3)
    via_agg = {r.id: r.score for r in classifier.score_documents(docs, w, b).collect()}
    via_expr = {
        r.doc_id: r.s
        for r in docs.select(
            "doc_id", F.round(classifier.score_expr(w, b), 6).alias("s")
        ).collect()
    }
    assert via_agg == via_expr


def test_bpe_train_and_encode(docs):
    """BPE trainer: merges match the pure-python reference algorithm
    (pinned via PY_ORACLES in test_correctness), ranks are dense, counts
    non-increasing in the first rounds' symbol mass, and encoding with the
    learned merges strictly shrinks the corpus token stream while merge
    order composes (later merges can reference earlier merged symbols)."""
    from universql_spark.operators.bpe import bpe_encode, bpe_train

    merges = bpe_train(docs, n_merges=6).collect()
    assert [m["rank"] for m in merges] == list(range(1, len(merges) + 1))
    assert all(m["freq"] > 0 for m in merges)
    # composition: at least one later merge consumes an earlier merge's output
    produced = {m["left"] + m["right"] for m in merges}
    assert any(
        m["left"] in produced or m["right"] in produced for m in merges[1:]
    )
    pairs = [(m["left"], m["right"]) for m in merges]
    base = bpe_encode(docs, []).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    enc = bpe_encode(docs, pairs).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert enc < base


def test_bloom_decontaminate_one_sided(spark, sf_dir):
    """Bloom membership can only over-report (false positives, never false
    negatives): every exact overlap is flagged, and flagged-minus-exact is
    the observable FP count. The fixture plants real overlaps (eval docs
    share shingles with near-duplicate probe docs)."""
    from universql_spark.queries import load_all

    rows = load_all()["dedup_bloom_decontaminate"].spark(spark, sf_dir).collect()
    assert rows, "probe side is non-empty"
    assert all(r["n_bloom_hits"] >= r["n_exact_hits"] for r in rows)
    assert all(r["n_shingles"] >= r["n_bloom_hits"] for r in rows)
    assert any(r["n_exact_hits"] > 0 for r in rows), "fixture has true overlap"


def test_kcenter_sample_properties(spark, sf_dir):
    """Farthest-point sampling invariants: dense ranks, distinct picks,
    and the selection distance is non-increasing from the second pick on
    (the min-distance-to-selected function only shrinks as the set grows)."""
    from universql_spark.operators.cluster import kcenter_sample

    out = kcenter_sample(spark.table("embeddings"), k=6).collect()
    assert [r["sel_rank"] for r in out] == list(range(1, 7))
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == len(ids)
    d = [r["min_dist2"] for r in out]
    assert d[0] == 0.0
    assert all(d[i] >= d[i + 1] for i in range(1, len(d) - 1))
    assert d[1] > 0.0


def test_seqlen_histogram_totals(spark, sf_dir):
    """Histogram partitions the corpus: bucket doc counts sum to the table
    count, shares to ~1, and bucket bounds are consistent."""
    from universql_spark.queries import load_all

    rows = load_all()["corpus_seqlen_histogram"].spark(spark, sf_dir).collect()
    n_docs = spark.table("documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert abs(sum(r["doc_share"] for r in rows) - 1.0) < 1e-2
    for r in rows:
        assert 32 * r["bucket"] <= r["min_tokens"] <= r["max_tokens"] < 32 * (r["bucket"] + 1)


def test_linear_count_sketch_bounds(spark, sf_dir):
    """Linear-counting invariants: set bits never exceed the true distinct
    count (each key sets one bit), the estimate is >= n_set_bits (log
    expansion corrects collisions upward), and at this load factor the
    estimate lands within 5% of exact."""
    from universql_spark.queries import load_all

    rows = load_all()["agg_linear_count_distinct"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_set_bits"] <= r["exact_distinct"]
        assert r["lc_estimate"] >= r["n_set_bits"]
        assert abs(r["lc_estimate"] - r["exact_distinct"]) <= max(3, 0.05 * r["exact_distinct"])


def test_patchify_orientation_and_means(spark):
    """Patchify parses real BMP bytes: the x/y-asymmetric gradient makes a
    forgotten bottom-up flip swap patch-row means — pin all four patch
    means of a known image (base=7, 8x6, 2x2 grid: 7 + 4c + 3r + 2.5)."""
    from universql_spark.operators import multimodal

    df = spark.createDataFrame([(7,)], "doc_id LONG")
    media = multimodal.synthesize_gradient_bmp_media(df)
    out = {
        (r["patch_row"], r["patch_col"]): r["patch_mean"]
        for r in multimodal.patchify_images(media, 2, 2).collect()
    }
    assert out == {(0, 0): 9.5, (0, 1): 13.5, (1, 0): 12.5, (1, 1): 16.5}


def test_pagerank_path_graph(spark):
    """PageRank invariants on a 3-node path a-b-c: mass conserved (no
    dangling nodes => sum == 1 within fp), center outranks endpoints,
    endpoints tie exactly (symmetry is bit-exact under decimal sums)."""
    from universql_spark.operators.components import pagerank

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r = {row["id"]: row["rank"] for row in pagerank(nodes, edges, iters=25).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r[2] > r[1] and r[1] == r[3]
    # dangling node keeps teleport-only mass (lost-mass variant)
    nodes2 = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    r2 = {row["id"]: row["rank"] for row in pagerank(nodes2, edges, iters=5).collect()}
    assert abs(r2[4] - 0.15 / 4) < 1e-12


def test_minhash_index_invalidated_by_data_rewrite(spark, tmp_path):
    """ADVICE r8 (low): the write-once signature index must not outlive the
    DATA it was built from. An in-place rewrite of the corpus parquet can
    leave the plan's semanticHash unchanged (catalog tables key the plan on
    the table identity, not the files) — the index key therefore folds in
    _data_version (leaf file listing + mtime/size)."""
    import time

    p = str(tmp_path / "corpus")
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(8)]
    spark.createDataFrame(rows, "doc_id int, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    docs1 = spark.read.parquet(p)
    pairs1 = dedup.minhash_lsh_pairs(docs1, threshold=0.8).count()
    assert pairs1 == 8 * 7 // 2  # all-identical corpus: every pair survives
    time.sleep(0.01)  # ensure mtime moves even on coarse filesystems
    rows2 = [(i, f"utterly distinct text {i} {i * 7} {i * 13}") for i in range(8)]
    spark.createDataFrame(rows2, "doc_id int, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(p)
    docs2 = spark.read.parquet(p)
    pairs2 = dedup.minhash_lsh_pairs(docs2, threshold=0.8).count()
    assert pairs2 == 0, "stale signature index served after data rewrite"


def test_maxsim_identical_vector_scores_full(emb):
    """A planted exact duplicate of a query vector must MaxSim-score exactly
    n_sub (every sub-cosine = 1.0) and rank first for that query."""
    dup = (
        emb.filter(F.col("vec_id") == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    )
    corpus = emb.unionByName(dup)
    out = similarity.maxsim_topk(
        corpus, emb.filter(F.col("vec_id") == 0), dim=64, n_sub=4, k=3
    ).collect()
    top = [r for r in out if r.rank == 1][0]
    assert top.d_id == 100000 and abs(top.maxsim - 4.0) < 1e-9
    # scores are bounded by n_sub and ranks are dense starting at 1
    assert all(r.maxsim <= 4.0 + 1e-9 for r in out)
    assert sorted(r.rank for r in out) == [1, 2, 3]


def test_maxsim_dominates_single_slice_cosine(emb):
    """MaxSim >= the plain full-vector cosine decomposed per slice: summing
    per-slice maxima can only beat matching each query slice to the same
    doc slice (the defining late-interaction inequality)."""
    probes = emb.filter(F.col("vec_id") < 3)
    out = {
        (r.q_id, r.d_id): r.maxsim
        for r in similarity.maxsim_topk(emb, probes, dim=64, n_sub=4, k=5).collect()
    }
    sub_q = similarity._subvector_rows(probes, "vec_id", "embedding", 4, 64, "q")
    sub_c = similarity._subvector_rows(emb, "vec_id", "embedding", 4, 64, "d")
    from pyspark.sql import functions as SF

    cos = SF.expr(similarity._dot_sql("q_vec", "d_vec")) / (
        SF.col("q_nrm") * SF.col("d_nrm")
    )
    diag = (
        sub_c.join(SF.broadcast(sub_q), SF.col("q_sub") == SF.col("d_sub"))
        .filter(SF.col("q_id") != SF.col("d_id"))
        .groupBy("q_id", "d_id")
        .agg(SF.sum(cos).alias("diag"))
    )
    diag_map = {(r.q_id, r.d_id): r.diag for r in diag.collect()}
    for key, ms in out.items():
        assert ms >= round(diag_map[key], 4) - 1e-6, (key, ms, diag_map[key])


def test_token_count_sql_equals_column(spark):
    """The SQL-string twin of textops.token_count must parse to the same
    expression semantics as the Column form on every edge (empty string,
    run-of-spaces squashing, leading/trailing whitespace, single token)."""
    from universql_spark.operators import textops

    rows = [
        ("",), ("   ",), ("one",), ("two words",), ("a  b   c",),
        ("  padded  both  ends  ",), ("tab\tis not space",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    col_form = df.select(textops.token_count(F.col("text")).alias("n")).collect()
    sql_form = df.select(F.expr(textops.token_count_sql("text")).alias("n")).collect()
    assert [r.n for r in col_form] == [r.n for r in sql_form]


def test_brute_force_topk_corpus_view_equals_default(emb):
    """corpus_view (a pre-registered view name) must produce exactly the
    rows the default registration path produces."""
    probes = emb.filter(F.col("vec_id") < 3)
    emb.createOrReplaceTempView("__bft_cv_test")
    via_view = similarity.brute_force_topk(
        emb, probes, k=4, sort=False, corpus_view="__bft_cv_test"
    ).collect()
    default = similarity.brute_force_topk(emb, probes, k=4, sort=False).collect()
    assert sorted(map(tuple, via_view)) == sorted(map(tuple, default))


def test_ivf_index_view_memo_survives_repeat_calls(emb):
    """Repeat ivf_topk calls reuse the registered index view (the memo path)
    and must stay value-identical call over call, including after another
    operator overwrites unrelated temp views."""
    probes = emb.filter(F.col("vec_id") < 3)
    first = similarity.ivf_topk(emb, probes, n_cells=4, n_probe=4, k=3, sort=False).collect()
    # interleave a brute-force call (registers __bft_* views) to prove the
    # ivf view registration is independent of other operators' registrations
    similarity.brute_force_topk(emb, probes, k=3, sort=False).collect()
    second = similarity.ivf_topk(emb, probes, n_cells=4, n_probe=4, k=3, sort=False).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
