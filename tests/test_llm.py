"""Property/invariant tests for the non-oracle (sketch/approx) LLM ops:
these are the correctness story where hash-matching SQL can't be
(SURVEY §2B Oracle=N rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.operators import dedup as dd
from speculare_pgcdc_spark.operators import multimodal as mm
from speculare_pgcdc_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return table(spark, sf_dir, "embeddings")


def test_lsh_pairs_subset_of_exact_with_high_recall(spark, docs):
    tok = dd.tokens(docs)
    exact = {
        (r.da, r.db) for r in dd.jaccard_pairs(tok, 0.6).collect()
    }
    lsh = {
        (r.da, r.db)
        for r in dd.minhash_lsh_pairs(docs, 0.6).select("da", "db").collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    assert exact, "fixture should contain near-dup pairs"
    recall = len(lsh) / len(exact)
    # 8 bands x 4 rows at tau=0.6: collision prob >= 1-(1-0.6^4)^8 ~ 0.67;
    # most fixture pairs sit well above 0.6 so empirical recall is higher
    assert recall >= 0.8, f"LSH recall too low: {recall:.3f}"


def test_simhash_deterministic_and_near_dup_sensitive(spark, docs):
    s1 = {r.doc_id: r.simhash for r in dd.simhash64(docs).collect()}
    s2 = {r.doc_id: r.simhash for r in dd.simhash64(docs).collect()}
    assert s1 == s2  # deterministic across runs

    # identical token sets => identical simhash: duplicate doc 0 under a
    # new id and check
    dup = docs.limit(1).select(
        F.lit(10_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    both = dd.simhash64(docs.unionByName(dup))
    vals = {r.doc_id: r.simhash for r in both.collect()}
    d0 = docs.select(F.min("doc_id")).first()[0]
    assert vals[10_000] == vals[d0]


def test_simhash_hamming_correlates_with_jaccard(spark, docs):
    sig = dd.simhash64(docs)
    a = sig.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb"))
    tok = dd.tokens(docs)
    exact = dd.jaccard_pairs(tok, 0.8).select("da", "db")
    near = (
        exact.join(a, "da").join(b, "db")
        .select(dd.hamming64(F.col("ha"), F.col("hb")).alias("d"))
    )
    rows = [r.d for r in near.collect()]
    assert rows, "expect some pairs with jaccard >= 0.8"
    # high-jaccard pairs should have clearly sub-random hamming distance
    # (random 64-bit pairs average 32)
    assert sum(rows) / len(rows) < 24


def test_ivf_with_full_probe_equals_brute_force(spark, emb):
    e = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    nparts = e.select("label").distinct().count()
    brute = [(r.vec_id, r.cos) for r in sim.cosine_topk(e, q, k=10).collect()]
    ivf_all = [
        (r.vec_id, r.cos)
        for r in sim.ivf_topk(e, q, k=10, nprobe=nparts).collect()
    ]
    assert ivf_all == brute


def test_ivf_partial_probe_results_come_from_probed_partitions(spark, emb):
    e = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    got = sim.ivf_topk(e, q, k=5, nprobe=2)
    joined = got.join(e.select("vec_id", "label"), "vec_id")
    labels = {r.label for r in joined.collect()}
    assert len(labels) <= 2


def test_multimodal_featurize_batch_contract(spark, docs):
    feats = mm.extract_features(mm.attach_payload(docs))
    rows = feats.orderBy("doc_id").limit(5).collect()
    assert rows
    for r in rows:
        assert r.mime == "application/octet-stream"
        assert r.n_bytes > 0
        assert len(r.feat) == 3
        assert r.feat[0] == float(r.n_bytes)


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\xff\xd8\xff", "image/jpeg")


def test_char_shingles(spark, docs):
    sh = dd.char_shingles(docs.limit(1), n=3)
    row = docs.limit(1).first()
    expected = {
        row.text[i : i + 3] for i in range(len(row.text) - 2)
    }
    got = {r.tok for r in sh.collect()}
    assert got == expected


def test_multimodal_resize_contract(spark, sf_dir):
    from speculare_pgcdc_spark.operators import multimodal as mm

    docs = table(spark, sf_dir, "documents").limit(20)
    out = mm.resize_images(mm.attach_payload(docs), width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.payload) == 32 for r in rows)
    assert all((r.width, r.height) == (8, 4) for r in rows)


def test_multimodal_frame_sample_one_to_many(spark, sf_dir):
    from speculare_pgcdc_spark.operators import multimodal as mm

    docs = table(spark, sf_dir, "documents").limit(5)
    out = mm.sample_frames(
        mm.attach_payload(docs), every_n_bytes=16, max_frames=4
    )
    rows = out.collect()
    # 1:N explode: more rows out than in, bounded by max_frames
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc) == 5
    for frames in per_doc.values():
        assert 1 <= len(frames) <= 4
        assert [f.frame_idx for f in sorted(frames, key=lambda x: x.frame_idx)] == list(range(len(frames)))
        assert all(f.ts_ms == f.frame_idx * 1000 for f in frames)
        assert all(len(f.frame) <= 16 for f in frames)


def test_asof_join_and_merge_variants_agree(spark, sf_dir):
    """J7: the join+argmax form and the union+window merge form must
    produce identical results (strict and non-strict, incl. equal-time
    tiebreaks)."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators.asof import (
        asof_join,
        asof_join_merge,
    )

    e = table(spark, sf_dir, "events").limit(2000)
    left = e.select(
        "event_id", F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts")
    )
    right = e.select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("prior_id"),
    )
    kw = dict(
        left_key="l_user", right_key="r_user",
        left_time="l_ts", right_time="r_ts",
        group_cols=["event_id"], value_col="prior_id",
    )
    for strict in (True, False):
        a = {
            (r.event_id, r.prior_id)
            for r in asof_join(left, right, strict=strict, **kw).collect()
        }
        b = {
            (r.event_id, r.prior_id)
            for r in asof_join_merge(
                left, right, strict=strict, **kw
            ).collect()
        }
        assert a == b, f"strict={strict}: {len(a)} vs {len(b)}"
        assert a, "expected matches"


def test_srp_lsh_recall_vs_exact_cosine_pairs(spark, sf_dir):
    """Embedding LSH scale path: verified SRP candidates are a subset of
    the exact near-dup pairs, with high recall (planes=16, bands=8 ->
    ~97% catch probability at tau=0.3)."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators import similarity as sim

    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding")
    )
    got = {
        (r.da, r.db)
        for r in sim.srp_neardup_pairs(emb, threshold=0.3).collect()
    }
    a = emb.select(F.col("vec_id").alias("da"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("db"), F.col("embedding").alias("eb"))
    cos = sim._dot(F.col("ea"), F.col("eb")) / (
        sim._norm(F.col("ea")) * sim._norm(F.col("eb"))
    )
    exact = {
        (r.da, r.db)
        for r in a.join(b, F.col("da") < F.col("db"))
        .filter(cos >= 0.3)
        .select("da", "db")
        .collect()
    }
    assert exact, "fixture should contain near-dup embedding pairs"
    assert got <= exact           # verification guarantees no false positives
    recall = len(got) / len(exact)
    assert recall >= 0.7, f"recall {recall:.2f} ({len(got)}/{len(exact)})"


def test_rolling_hashes_short_text_yields_empty(spark):
    """sequence(1, 0) is DESCENDING in Spark, not empty: texts shorter
    than k must produce [] (and a '' fingerprint), never phantom
    hashes."""
    from speculare_pgcdc_spark.operators import textstats as ts
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("abc",), ("",), ("exactly8",), ("longer than eight",)],
        "text string",
    ).select(
        "text",
        ts.rolling_hashes("text").alias("h"),
        ts.rolling_fingerprint("text").alias("fp"),
        F.length("text").alias("n"),
    )
    rows = {r.text: r for r in df.collect()}
    assert rows["abc"].h == [] and rows["abc"].fp == ""
    assert rows[""].h == [] and rows[""].fp == ""
    assert len(rows["exactly8"].h) == 1
    assert len(rows["longer than eight"].h) == 17 - 8 + 1


def test_char_shingles_short_text_yields_no_rows(spark):
    from speculare_pgcdc_spark.operators.dedup import char_shingles

    docs = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, "abcd")], "doc_id bigint, text string"
    )
    rows = char_shingles(docs, n=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.tok)
    assert 1 not in got and 2 not in got
    assert got[3] == {"abc", "bcd"}


def _clustered_embeddings(spark, n_clusters=6, per_cluster=40, dim=16):
    """Deterministic clustered vectors: cluster c's center is a one-hot-
    ish axis vector; members jitter around it (hash-derived, no RNG
    state). Near-neighbors are within-cluster by construction."""
    import math

    rows = []
    for c in range(n_clusters):
        for i in range(per_cluster):
            vec = []
            for d in range(dim):
                base = 1.0 if d == c else 0.0
                jitter = (hash((c, i, d)) % 1000) / 10000.0  # < 0.1
                vec.append(base + jitter)
            norm = math.sqrt(sum(x * x for x in vec))
            rows.append((c * per_cluster + i, c, [x / norm for x in vec]))
    return spark.createDataFrame(
        rows, "vec_id bigint, true_cluster int, embedding array<double>"
    )


def test_kmeans_ivf_recall_on_clustered_data(spark):
    """The trained quantizer must recover cluster structure: IVF with
    nprobe=2 of k=6 cells reaches recall@5 >= 0.9 against exact brute
    force for queries from every cluster. (The parquet fixture's
    embeddings are isotropic noise — no index can beat nprobe/k recall
    there, so the recall pin uses constructed clusters; the fixture
    covers the degradation invariant below.)"""
    e = _clustered_embeddings(spark)
    cents = sim.kmeans_centroids(e, k=6, iters=4)
    hits = total = 0
    for qc in range(6):
        qid = qc * 40  # first member of each cluster as the query
        q = e.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("q")
        )
        rest = e.filter(F.col("vec_id") != qid)
        exact = {r.vec_id for r in sim.cosine_topk(rest, q, k=5).collect()}
        approx = {
            r.vec_id
            for r in sim.ivf_topk_trained(
                rest, q, cents, k=5, nprobe=2
            ).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    assert total == 30 and hits / total >= 0.9, f"recall {hits}/{total}"


def test_kmeans_training_is_deterministic(spark):
    e = _clustered_embeddings(spark, n_clusters=4, per_cluster=20)
    c1 = sim.kmeans_centroids(e, k=4, iters=3)
    c2 = sim.kmeans_centroids(e, k=4, iters=3)
    assert c1 == c2


def test_trained_ivf_full_probe_equals_brute_force(spark, emb):
    """nprobe == k probes every cell, so trained IVF must degrade to
    exact brute force — on the REAL fixture (isotropic embeddings)."""
    e = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    cents = sim.kmeans_centroids(e, k=4, iters=2)
    brute = [(r.vec_id, r.cos) for r in sim.cosine_topk(e, q, k=10).collect()]
    ivf_all = [
        (r.vec_id, r.cos)
        for r in sim.ivf_topk_trained(e, q, cents, k=10, nprobe=4).collect()
    ]
    assert ivf_all == brute


def _fake_image_cls():
    """Minimal PIL.Image stand-in: decodes our 'format' (payload =
    b'IMG!' + raw bytes), resizes by truncate/repeat — enough to drive
    the real-decode branch deterministically where PIL is absent.
    Defined INSIDE a function so cloudpickle ships it by VALUE to the
    executors (a module-level test class pickles by reference, and
    workers cannot import the test module)."""

    class FakeImage:
        def __init__(self, data: bytes):
            if not data.startswith(b"IMG!"):
                raise ValueError("not an IMG! payload")
            self.data = data[4:]
            self.size = (0, 0)

        def convert(self, mode):
            return self

        def resize(self, wh):
            self.size = wh
            return self

        def tobytes(self):
            n = self.size[0] * self.size[1]
            return (self.data * (n // max(len(self.data), 1) + 1))[:n]

        @staticmethod
        def open(buf):
            return FakeImage(buf.read())

    return FakeImage


@pytest.mark.parametrize("branch", ["decoder", "standin"])
def test_resize_images_both_branches(spark, docs, branch, monkeypatch):
    """The import-guarded real-decode path and the codec-less stand-in
    must honor the same contract: schema, declared dims, exact payload
    size. The decoder branch runs via an injected fake (PIL is absent
    in this container); undecodable payloads fall back per-row."""
    with_payload = mm.attach_payload(docs.limit(8))
    if branch == "decoder":
        monkeypatch.setattr(mm, "_load_pil", _fake_image_cls)
        # fixture payloads are text bytes -> not IMG! -> per-row
        # fallback must kick in, not poison the batch
        out = mm.resize_images(with_payload, width=8, height=4,
                               use_decoder=True)
    else:
        out = mm.resize_images(
            with_payload, width=8, height=4, use_decoder=False
        )
    rows = out.collect()
    assert len(rows) == 8
    assert all(len(r.payload) == 32 and r.width == 8 and r.height == 4
               for r in rows)

    if branch == "decoder":
        # a decodable payload goes through the fake decoder for real
        img_df = spark.createDataFrame(
            [(1, b"IMG!abc", {"mime": "image/fake", "n_bytes": 7})],
            "doc_id bigint, payload binary, meta struct<mime:string,"
            "n_bytes:bigint>",
        )
        (row,) = mm.resize_images(
            img_df, width=4, height=2, use_decoder=True
        ).collect()
        assert row.payload == (b"abc" * 3)[:8]  # decoded, not padded


def test_resize_use_decoder_true_requires_decoder(docs):
    with pytest.raises(RuntimeError, match="PIL is not importable"):
        mm.resize_images(mm.attach_payload(docs), use_decoder=True)
