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
    """SRP banding: verified candidates are a subset of the exact pairs
    with high recall. NB at tau=0.3 high recall comes at near-zero
    selectivity (bit agreement 0.597 vs 0.5 random — see the regime
    note on srp_neardup_pairs); this pins subset+recall only. The
    selective low-threshold path is cluster_neardup_pairs (q91)."""
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


def test_repetition_counts_edge_cases(spark):
    """Short/empty/null texts must not grow phantom n-grams (the
    sequence(1, m<1) descending trap), and a fully repeated text must
    trip the integer cross-multiply flag."""
    from speculare_pgcdc_spark.operators.textstats import (
        repetition_counts,
    )

    df = spark.createDataFrame(
        [
            (0, None),
            (1, ""),
            (2, "solo"),
            (3, "a b"),
            (4, "spam spam spam spam spam spam"),
            (5, "all distinct words here now"),
        ],
        "doc_id bigint, text string",
    )
    cnt = repetition_counts(F.col("text"), n=2)
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[cnt[k].alias(k) for k in cnt],
            ((cnt["n_gram"] - cnt["n_gram_distinct"]) * 5 > cnt["n_gram"])
            .alias("rep"),
        ).collect()
    }
    assert (rows[0]["n_tok"], rows[0]["n_gram"]) == (0, 0)
    assert (rows[1]["n_tok"], rows[1]["n_gram"]) == (0, 0)
    assert (rows[2]["n_tok"], rows[2]["n_gram"]) == (1, 0)
    assert (rows[3]["n_gram"], rows[3]["n_gram_distinct"]) == (1, 1)
    # "spam spam" x5 bigrams, 1 distinct: dup frac 4/5 > 0.2
    assert (rows[4]["n_gram"], rows[4]["n_gram_distinct"]) == (5, 1)
    assert rows[4]["rep"] is True
    assert rows[5]["rep"] is False
    assert rows[0]["rep"] is False  # 0 > 0 is false, not null


def test_pii_redaction_operators(spark):
    """Digit masking with/without keep-last, short-string edge, email
    redaction + counting."""
    from speculare_pgcdc_spark.operators import pii

    df = spark.createDataFrame(
        [
            (0, "25-989-741-2988", "mail me at bob.smith+x@corp.example.com ok"),
            (1, "abc", "no pii here"),
            (2, "12", "two mails: a@b.io and c.d@e-f.org!"),
        ],
        "id bigint, phone string, body string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            pii.redact_digits(F.col("phone")).alias("full"),
            pii.redact_digits(F.col("phone"), keep_last=4).alias("last4"),
            pii.digit_count(F.col("phone")).alias("nd"),
            pii.redact_emails(F.col("body")).alias("clean"),
            pii.email_count(F.col("body")).alias("ne"),
        ).collect()
    }
    assert rows[0]["full"] == "XX-XXX-XXX-XXXX"
    assert rows[0]["last4"] == "XX-XXX-XXX-2988"
    assert rows[0]["nd"] == 12
    assert rows[0]["clean"] == "mail me at <EMAIL> ok"
    assert rows[0]["ne"] == 1
    assert rows[1]["full"] == "abc" and rows[1]["nd"] == 0
    # string shorter than keep_last stays verbatim
    assert rows[2]["last4"] == "12"
    assert rows[2]["clean"] == "two mails: <EMAIL> and <EMAIL>!"
    assert rows[2]["ne"] == 2


def test_kmeans_clusters_query_invariants(spark):
    """q85: cluster sizes sum to the corpus, cohesion is a valid
    cosine, and the whole pipeline is deterministic across reruns."""
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    fn = reg["q85_kmeans_clusters"].fn
    a = fn(spark, "/root/testdata/sf0.001").collect()
    total = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert sum(r["n_vecs"] for r in a) == total
    assert all(-1.0 <= r["mean_cos"] <= 1.0 for r in a)
    assert len(a) <= 8
    b = fn(spark, "/root/testdata/sf0.001").collect()
    assert a == b


@pytest.mark.parametrize("driver_limit", [200_000, 0])
def test_dup_components_chain_and_convergence(spark, driver_limit):
    """A 4-node chain (needs >1 propagation round), a 2-node pair, and
    an isolated pair: components resolve to min-id labels exactly —
    identically on the driver union-find fast path (driver_limit
    default) and the distributed min-label loop (driver_limit=0)."""
    from speculare_pgcdc_spark.operators.dedup import dup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        "da bigint, db bigint",
    )
    got = {
        (r.id, r.comp)
        for r in dup_components(pairs, driver_limit=driver_limit).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20),
    }


def test_chunk_texts_edges(spark):
    """Zero-token docs emit no chunks (sequence(0,-1) trap); short docs
    emit exactly one; stride/overlap arithmetic is exact."""
    from speculare_pgcdc_spark.operators.textstats import chunk_texts

    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "solo"), (3, mk(50)), (4, mk(51)),
         (5, mk(130))],
        "doc_id bigint, text string",
    )
    rows = {}
    for r in chunk_texts(df, chunk=50, stride=40).collect():
        rows.setdefault(r.doc_id, []).append(r)
    assert 0 not in rows and 1 not in rows
    assert [c.n_tok_chunk for c in rows[2]] == [1]
    assert [c.n_tok_chunk for c in rows[3]] == [50]
    # 51 tokens: chunks at 0 and 40 -> lengths 50, 11
    assert [c.n_tok_chunk for c in sorted(rows[4], key=lambda c: c.chunk_idx)] == [50, 11]
    # 130 tokens: starts 0,40,80 cover to 130 -> 1+ceil(80/40)=3 chunks
    assert [c.n_tok_chunk for c in sorted(rows[5], key=lambda c: c.chunk_idx)] == [50, 50, 50]


def test_textstats_builders_tokenize_once(spark):
    """r14 bind-once lint: each textstats builder's optimized plan
    holds exactly ONE split of its text input. Referencing the toks
    Column object copies the split subtree per reference (with fresh
    lambda ExprIds codegen CSE cannot merge) — q88's generator held
    SEVEN copies, word_ngrams three, quality_score three; _bind pins
    them to one."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators.textstats import (
        avg_token_len,
        chunk_texts,
        quality_score,
        stopword_ratio,
        word_ngrams,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    cases = {
        # alias each output: an auto-generated column NAME echoes the
        # expression text and would double-count "split("
        "word_ngrams": df.select(word_ngrams(F.col("text"), 3).alias("g")),
        "quality_score": df.select(quality_score(F.col("text")).alias("q")),
        "stopword_ratio": df.select(
            stopword_ratio(F.col("text")).alias("s")
        ),
        "avg_token_len": df.select(
            avg_token_len(F.col("text")).alias("a")
        ),
        # generator + the per-chunk size(split(_chunk)) = 2
        "chunk_texts": chunk_texts(df),
    }
    for name, out in cases.items():
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        budget = 2 if name == "chunk_texts" else 1
        assert plan.count("split(") <= budget, (name, plan)


def test_contamination_counts(spark):
    """Doc sharing an 8-gram window with the eval set is counted; a
    disjoint doc scores zero hits."""
    from speculare_pgcdc_spark.operators.dedup import contaminated_docs

    shared = " ".join(f"w{i}" for i in range(8))
    train = spark.createDataFrame(
        [(1, shared + " tail1 tail2"), (2, "all fresh words only here now lots more")],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix " + shared)], "doc_id bigint, text string"
    )
    got = {r.doc_id: (r.n_grams, r.n_hit)
           for r in contaminated_docs(train, ev, n=8).collect()}
    # doc 1: 10 tokens -> 3 distinct 8-grams, exactly one shared
    assert got[1] == (3, 1)
    assert got[2] == (1, 0)


def test_dup_components_nonconvergence_raises(spark):
    """The distributed loop must FAIL, not silently return split
    components, when the graph diameter exceeds max_iter."""
    from speculare_pgcdc_spark.operators.dedup import dup_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "da bigint, db bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dup_components(chain, max_iter=2, driver_limit=0)


def test_l2_normalize_degenerate_vectors(spark):
    """Zero-norm (and sub-eps) vectors null out instead of raising
    DIVIDE_BY_ZERO under ANSI mode or emitting ~1/eps garbage."""
    from speculare_pgcdc_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [1e-9, 0.0])],
        "id bigint, v array<double>",
    )
    rows = {
        r.id: r.u
        for r in df.select(
            "id", l2_normalize(F.col("v"), eps=1e-6).alias("u")
        ).collect()
    }
    assert rows[0] == [0.6, 0.8]
    assert rows[1] == [None, None]
    assert rows[2] == [None, None]  # sub-eps caught by threshold


def test_chunk_texts_rejects_gapped_stride(spark):
    from speculare_pgcdc_spark.operators.textstats import chunk_texts

    df = spark.createDataFrame([(0, "a b c")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="must be <= chunk"):
        chunk_texts(df, chunk=2, stride=5)


def test_gapfill_ignores_null_timestamps(spark):
    """A null-timestamp row has no bucket: its value must NOT become
    the LOCF carry / interpolation anchor for real buckets."""
    import datetime as dt

    from speculare_pgcdc_spark.operators.timeseries import (
        gapfill_interpolate,
        gapfill_locf,
    )

    rows = [
        (1, None, 99.0),
        (1, dt.datetime(2020, 1, 1, 10, 30), None),
        (1, dt.datetime(2020, 1, 1, 12, 30), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    locf = sorted(
        (r.bucket, r.c, r.v_locf)
        for r in gapfill_locf(df, key="user_id").collect()
    )
    # buckets: 10:00 (null-value obs), 11:00 (gap), 12:00 (value 5.0);
    # the 99.0 from the null-ts row must appear NOWHERE
    assert [c for _, c, _ in locf] == [1, 0, 1]
    assert [v for _, _, v in locf] == [None, None, 5.0]
    interp = sorted(
        (r.bucket, r.v_interp)
        for r in gapfill_interpolate(df, key="user_id").collect()
    )
    assert [v for _, v in interp] == [None, None, 5.0]


def test_q85_mean_cos_excludes_zero_norm_sentinel(spark):
    """A zero embedding scores the -2.0 sentinel; cohesion must stay a
    real cosine (>= -1) with the vector still counted in n_vecs."""
    from speculare_pgcdc_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    assigned = sim.assign_nearest(emb, [[1.0, 0.0]], out_score="_cos")
    valid = F.when(
        F.col("_cos") >= -1.0,
        F.round(F.col("_cos"), 6).cast("decimal(28,6)"),
    )
    n_valid = F.count(valid)
    row = (
        assigned.groupBy("_cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.when(n_valid > 0, F.sum(valid).cast("double") / n_valid)
            .alias("mc"),
        )
        .collect()[0]
    )
    assert row.n == 3
    assert -1.0 <= row.mc <= 1.0


def test_cluster_neardup_fixture_recall(spark, sf_dir):
    """q91 on the FIXTURE: verified output is a subset of the exact
    pairs with high recall. The fixture's tau=0.3 pairs are mostly
    isotropic (43/351 intra-label at sf0.001), so this pins the
    mechanism + recall only; the selectivity property needs clustered
    structure and is pinned on constructed data below — same split the
    kmeans-IVF recall test makes, and the reason the operator docstring
    says no bucketing is selective on isotropic low-threshold data."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators import similarity as sim

    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", "embedding")
    )
    got = {
        (r.da, r.db)
        for r in sim.cluster_neardup_pairs(
            emb, threshold=0.3, k=10, iters=4, probes=3
        ).collect()
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
    assert got <= exact  # verification: no false positives ever
    recall = len(got) / len(exact)
    assert recall >= 0.85, f"recall {recall:.2f} ({len(got)}/{len(exact)})"


def test_cluster_neardup_selective_on_clustered_data(spark):
    """On CLUSTERED data — the structure the operator exists for — the
    quantizer must deliver BOTH near-perfect recall and real
    selectivity (candidates a small fraction of all pairs). 20 tight
    clusters x 15 vectors: intra-cluster cos ~0.9+, cross ~0."""
    import math

    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators import similarity as sim

    k, per, dim = 20, 15, 16
    rows = []
    vid = 0
    for c in range(k):
        # deterministic orthogonal-ish cluster centers: one-hot-ish
        # direction per cluster with a small deterministic wobble
        base = [0.0] * dim
        base[c % dim] = 1.0
        base[(c * 7 + 3) % dim] += 0.5 if c >= dim else 0.0
        for j in range(per):
            wobble = [
                0.05 * math.sin(1.0 + 13.0 * c + 7.0 * j + d)
                for d in range(dim)
            ]
            rows.append(
                (vid, [float(b + w) for b, w in zip(base, wobble)])
            )
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    n = vid
    got = sim.cluster_neardup_pairs(
        emb, threshold=0.5, k=k, iters=4, probes=2
    )
    a = emb.select(F.col("vec_id").alias("da"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("db"), F.col("embedding").alias("eb"))
    cos = sim._dot(F.col("ea"), F.col("eb")) / (
        sim._norm(F.col("ea")) * sim._norm(F.col("eb"))
    )
    exact = {
        (r.da, r.db)
        for r in a.join(b, F.col("da") < F.col("db"))
        .filter(cos >= 0.5)
        .select("da", "db")
        .collect()
    }
    got_set = {(r.da, r.db) for r in got.collect()}
    assert exact and got_set <= exact
    recall = len(got_set) / len(exact)
    assert recall >= 0.95, f"recall {recall:.2f}"

    cents = sim.kmeans_centroids(emb, k=k, iters=4)
    cells = sim.assign_probe_cells(emb, cents, probes=2).select(
        "vec_id", "_cell"
    )
    ca = cells.select(F.col("vec_id").alias("da"), "_cell")
    cb = cells.select(F.col("vec_id").alias("db"), "_cell")
    n_cand = (
        ca.join(cb, "_cell")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
        .count()
    )
    all_pairs = n * (n - 1) // 2
    frac = n_cand / all_pairs
    assert frac <= 0.35, f"not selective on clustered data: {frac:.2f}"


def test_assign_probe_cells_top1_matches_assign_nearest(spark, sf_dir):
    """probes=1 must agree with assign_nearest (same model, same
    deterministic tie-break)."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators import similarity as sim

    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", "embedding")
    )
    cents = sim.kmeans_centroids(emb, k=5, iters=2)
    top1 = {
        r.vec_id: r._cell
        for r in sim.assign_probe_cells(emb, cents, probes=1).collect()
    }
    nearest = {
        r.vec_id: r._cid
        for r in sim.assign_nearest(emb, cents).collect()
    }
    assert top1 == nearest


def test_srp_signature_slices_long_vectors(spark):
    """A vector LONGER than `dim` must project onto its first dim
    components (the element_at semantics), not collapse to sig=0 via
    NULL-padded zip_with — sig=0 vectors would collide in every LSH
    band and quietly degrade the candidate join to all-pairs."""
    from pyspark.sql import functions as F

    from speculare_pgcdc_spark.operators import similarity as sim

    dim = 8
    long_vec = [1.0] * dim + [9.0] * 4  # 12 components, dim=8
    short_vec = [1.0] * dim
    df = spark.createDataFrame(
        [(1, long_vec), (2, short_vec)],
        "vec_id bigint, embedding array<float>",
    )
    sigs = {
        r.vec_id: r.sig
        for r in sim.srp_signature(df, planes=8, dim=dim).collect()
    }
    # identical first-dim prefix => identical signature; never 0 for a
    # non-degenerate vector
    assert sigs[1] == sigs[2]
    assert sigs[1] != 0


def test_heavy_hitters_equal_exact_topk(spark, sf_dir):
    """q100 vs the exact q44 computation: with the default summary
    size the MG guarantee covers the fixture's top-20, so the sketch
    path must return EXACTLY the same ranking and counts."""
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    got = [
        (r["tok"], r["c"])
        for r in reg["q100_heavy_hitters"].fn(spark, sf_dir).collect()
    ]
    docs = table(spark, sf_dir, "documents")
    exact = (
        docs.select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(20)
        .collect()
    )
    assert got == [(r["tok"], r["c"]) for r in exact]


def test_heavy_hitters_on_zipf_with_tiny_summary(spark):
    """Constructed Zipf-ish data with a summary far smaller than the
    vocabulary: true heavies clear the N/(s+1) bar and must surface
    with exact counts; the bounded summary is the point."""
    from speculare_pgcdc_spark.operators.heavyhitters import (
        misra_gries_topk,
    )

    rows = (
        [("alpha",)] * 500
        + [("beta",)] * 300
        + [("gamma",)] * 200
        + [(f"tail{i}",) for i in range(400)]  # 400 singletons
    )
    df = spark.createDataFrame(rows, ["tok"]).repartition(8)
    got = [
        (r["tok"], r["c"])
        for r in misra_gries_topk(
            df, "tok", k=3, summary_size=16
        ).collect()
    ]
    assert got == [("alpha", 500), ("beta", 300), ("gamma", 200)]


def test_mg_partition_summary_is_bounded():
    """The per-partition sketch must emit at most summary_size rows no
    matter the input, and over-threshold items must survive eviction."""
    import pandas as pd

    from speculare_pgcdc_spark.operators.heavyhitters import (
        _mg_summaries,
    )

    run = _mg_summaries("tok", 8)
    batches = [
        pd.DataFrame({"tok": ["hot"] * 50 + [f"u{i}" for i in range(40)]}),
        pd.DataFrame({"tok": ["hot"] * 50 + [f"v{i}" for i in range(40)]}),
    ]
    out = list(run(iter(batches)))
    assert len(out) == 1 and len(out[0]) <= 8
    summary = dict(zip(out[0]["tok"], out[0]["mg_bound"]))
    assert "hot" in summary  # f=100 > N/(s+1)=180/9=20
    assert summary["hot"] <= 100  # lower bound, never an overcount


def test_pq_codes_and_exact_rerank_on_fixtures(spark, emb):
    """PQ ANN structure on the (near-random — ANN-adversarial) fixture
    vectors: codes are m small ints (the 32x index compression) and
    the re-rank makes every returned score exactly the true cosine.
    Recall is pinned separately on clustered data, where nearness
    exists to recover (same split as the trained-IVF tests)."""
    e = emb.filter(F.col("vec_id") != 0)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    books = sim.pq_train(e, m=8, k=16, iters=2)
    assert len(books) == 8 and all(len(b) == 16 for b in books)

    codes = sim.pq_encode(e, books)
    row = codes.select("code").first()
    assert len(row.code) == 8
    assert all(0 <= c < 16 for c in row.code)

    brute = {r.vec_id: r.cos for r in sim.cosine_topk(e, q, k=5).collect()}
    got = {r.vec_id: r.cos for r in sim.pq_topk(e, q, books, k=5).collect()}
    assert len(got) == 5
    # re-ranked scores are exact cosines (match brute force where ids agree)
    for vid in set(got) & set(brute):
        assert abs(got[vid] - brute[vid]) < 1e-9


def test_pq_recall_on_clustered_data(spark):
    """Where true near neighbors exist (10 tight clusters), PQ's ADC
    candidates + exact re-rank recover >= 4/5 of the brute-force
    top-5."""
    import random as _random

    rng = _random.Random(11)
    dim, n_clusters, per = 64, 10, 40
    centers = [
        [rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per):
            rows.append(
                (vid, [x + rng.gauss(0, 0.05) for x in c])
            )
            vid += 1
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    data = e.filter(F.col("vec_id") != 0)
    brute = {r.vec_id for r in sim.cosine_topk(data, q, k=5).collect()}
    books = sim.pq_train(data, m=8, k=16, iters=2)
    got = {r.vec_id for r in sim.pq_topk(data, q, books, k=5).collect()}
    assert len(got & brute) >= 4, (sorted(got), sorted(brute))


def test_pq_train_is_deterministic(spark, emb):
    e = emb.filter(F.col("vec_id") != 0)
    b1 = sim.pq_train(e, m=4, k=8, iters=1)
    b2 = sim.pq_train(e, m=4, k=8, iters=1)
    assert b1 == b2


def test_pq_train_rejects_indivisible_dim(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_train(emb.filter(F.col("vec_id") != 0), m=7, k=4, iters=1)


def test_ivf_cell_partitioned_scan_prunes(spark, emb, tmp_path):
    """The IVF scale path stated in SCALING.md §6, proven end-to-end:
    persist the corpus partitioned by its assigned cell id, and a
    probe-cell filter must prune at the SCAN (PartitionFilters), so
    nprobe/k of the data is never read — the 100 TB contract."""
    from speculare_pgcdc_spark.sources import write_parquet

    e = emb.filter(F.col("vec_id") != 0)
    cents = sim.kmeans_centroids(e, k=4, iters=1)
    assigned = sim.assign_nearest(e, cents).withColumnRenamed(
        "_cid", "cell"
    )
    out = str(tmp_path / "ivf_cells")
    write_parquet(assigned, out, partition_by=["cell"])

    scan = spark.read.parquet(out).filter(F.col("cell").isin(0, 1))
    p = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in p
    assert "cell" in p.split("PartitionFilters")[1][:200]
    # and the pruned read really returns only the probed cells
    assert {r.cell for r in scan.select("cell").distinct().collect()} <= {0, 1}


def test_q162_each_source_draws_exactly_k_ticks(spark, sf_dir):
    """Systematic PPS invariant: the tick count per source stream is
    EXACTLY k (copies sum to k), and every multiplicity is >= 1 —
    the without-replacement-with-multiplicity contract."""
    from speculare_pgcdc_spark.queries import load_all
    from speculare_pgcdc_spark.queries.curation import PPS_K

    rows = (
        load_all()["q162_pps_systematic_sample"]
        .fn(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("n_copies").alias("total"))
        .collect()
    )
    assert rows
    for r in rows:
        assert r.total == PPS_K, (r.source, r.total)


def test_gate_queries_are_not_vacuous(spark, sf_dir):
    """Filter-bearing gates must EXERCISE their filters: a 0-row
    oracle match proves nothing (round-5 lesson — the majority
    dominance threshold and doc-level overlap fingerprints were
    vacuously empty on this corpus until re-tuned). If a fixture
    regeneration empties one of these again, fail loudly here rather
    than letting the driver record a hollow green row."""
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    names = [
        "q151_dominant_supplier",
        "q172_source_overlap",
        "q147_zscore_outliers",
        "q148_iqr_outliers",
        "q27_except",
        "q113_tpch_q22_dormant_customers",
    ]
    if "sf0.001" not in sf_dir:
        # the 3-sigma detectors need enough minutes to spike; the
        # tiny fixture legitimately has none — they are pinned
        # non-vacuous at the driver's sf0.01 gate and above
        names += ["q168_burst_detection", "q177_cusum_changepoints"]
    if "sf0.1" not in sf_dir:
        # q149's fixed value-share threshold thins with part count:
        # at sf0.1 no single part reaches the share and the gate is
        # legitimately empty (first observed in the r9 sf0.1 gate
        # run); it stays pinned non-vacuous at the driver's sf0.01
        # oracle scale and below
        names += ["q149_value_share"]
    for name in names:
        assert reg[name].fn(spark, sf_dir).count() > 0, name
    tri = reg["q146_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert tri.triangles > 0 and tri.n_edges > 0
    # round-9 gates: each new filter/threshold query must fire both
    # ways on the fixture (q279's first form measured lateness of a
    # perfectly-ordered feed — identically zero, a hollow green)
    dd = reg["q272_partition_digest_diff"].fn(spark, sf_dir).collect()[0]
    assert 0 < dd.n_days_diverged < dd.n_days
    wl = reg["q279_watermark_lateness"].fn(spark, sf_dir).collect()[0]
    assert wl.n_late_1m > 0, "lateness gate is vacuous"
    assert wl.n_late_1h == 0  # provable: delay bound < 1h
    n_pairs = reg["q278_winnowing_pairs"].fn(spark, sf_dir).count()
    from speculare_pgcdc_spark.queries.corpus_metrics import (
        WINNOW_DOC_CAP,
    )
    assert 0 < n_pairs < WINNOW_DOC_CAP * (WINNOW_DOC_CAP - 1) // 2
    kc = reg["q280_kcore_decomposition"].fn(spark, sf_dir).collect()[0]
    assert 0 < kc.n_core_nodes < kc.n_nodes, "k-core gate is vacuous"
    # every quality rule must discriminate (both truth values occur)
    rules = reg["q152_quality_rules"].fn(spark, sf_dir)
    for c in ("rule_length", "rule_word_len", "rule_uniq",
              "rule_stopword", "passes"):
        assert rules.select(c).distinct().count() == 2, c


def test_q280_kcore_invariants(spark, sf_dir):
    """The k-core's DEFINING properties, exact (the rows-only
    contract's teeth — recursive peeling has no single-SQL oracle):
    (a) every core node keeps >= k neighbors INSIDE the core;
    (b) no removed node has >= k neighbors in the core (degrees only
    shrink while peeling, so such a node could never be removed) —
    (a)+(b) are exactly uniqueness+maximality of the k-core."""
    from speculare_pgcdc_spark.operators.graph import kcore
    from speculare_pgcdc_spark.queries.corpus_metrics import KCORE_K

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    e = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("ua"),
            (F.col("l_suppkey") * 2 + 1).alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    core, _ = kcore(e, KCORE_K)
    core_edges = {(r.ua, r.ub) for r in core.collect()}
    all_edges = {(r.ua, r.ub) for r in e.collect()}
    assert core_edges <= all_edges
    core_nodes = {u for ed in core_edges for u in ed}
    # (a) in-core degree >= k for every core node
    from collections import Counter

    deg_in_core = Counter()
    for ua, ub in core_edges:
        deg_in_core[ua] += 1
        deg_in_core[ub] += 1
    assert core_nodes, "empty core is a vacuous test"
    assert min(deg_in_core.values()) >= KCORE_K
    # (b) no removed node has >= k neighbors in the core
    removed_deg = Counter()
    for ua, ub in all_edges - core_edges:
        if ua not in core_nodes:
            removed_deg[ua] += 1 if ub in core_nodes else 0
        if ub not in core_nodes:
            removed_deg[ub] += 1 if ua in core_nodes else 0
    assert all(d < KCORE_K for d in removed_deg.values())


@pytest.fixture(scope="module")
def triplet_frames(spark, emb):
    e = emb.select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        sim._norm(F.col("embedding")).alias("nrm"),
    )
    anchors = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("aid"),
        F.col("label").alias("albl"),
        F.col("v").alias("av"),
        F.col("nrm").alias("an"),
    )
    cands = e.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clbl"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    return anchors, cands


def test_mine_triplets_candidates_hook_parity(spark, triplet_frames):
    """The q202 ANN hook (r7 verdict item 6): a LOSSLESS candidate
    frame routed through mine_triplets(candidates=...) must reproduce
    the exact cross-join path row for row — same argmax/argmin, same
    ppm scores, same tie-breaks. Duplicated candidate rows (the
    multi-probe shape) must not perturb anything either."""
    anchors, cands = triplet_frames
    exact = sim.mine_triplets(anchors, cands).collect()
    assert exact and any(r.hard_neg_id is not None for r in exact)

    allpairs = anchors.select("aid").crossJoin(cands.select("cid"))
    hooked = sim.mine_triplets(
        anchors, cands, candidates=allpairs
    ).collect()
    assert hooked == exact

    dup = allpairs.unionAll(allpairs.limit(64))
    hooked_dup = sim.mine_triplets(
        anchors, cands, candidates=dup
    ).collect()
    assert hooked_dup == exact


def test_mine_triplets_ivf_cell_candidates(spark, emb, triplet_frames):
    """The real ANN candidate generator through the hook: same-cell
    (anchor, candidate) pairs from assign_probe_cells. With probes =
    all cells the frame is exhaustive -> identical to exact; with
    probes=1 the mined scores must obey the subset bounds (candidate
    hard-neg sim <= exact argmax; candidate far-pos sim >= exact
    argmin) — the quantified "recall costs hardness" contract."""
    anchors, cands = triplet_frames
    cents = [
        list(r.centroid)
        for r in sim.ivf_centroids(
            emb.select("label", "embedding")
        ).orderBy("label").collect()
    ]

    def cell_pairs(probes: int):
        a_cells = sim.assign_probe_cells(
            anchors, cents, probes=probes, vec_col="av"
        ).select("aid", "_cell")
        c_cells = sim.assign_probe_cells(
            cands, cents, probes=probes, vec_col="cv"
        ).select("cid", "_cell")
        return a_cells.join(c_cells, "_cell").select("aid", "cid")

    exact = {r.vec_id: r for r in sim.mine_triplets(anchors, cands).collect()}

    full = sim.mine_triplets(
        anchors, cands, candidates=cell_pairs(len(cents))
    ).collect()
    assert {r.vec_id: r for r in full} == exact

    narrow = sim.mine_triplets(
        anchors, cands, candidates=cell_pairs(1)
    ).collect()
    assert narrow, "probes=1 must still mine something"
    for r in narrow:
        ex = exact[r.vec_id]
        if r.hard_neg_sim_ppm is not None:
            assert r.hard_neg_sim_ppm <= ex.hard_neg_sim_ppm
        if r.far_pos_sim_ppm is not None:
            assert r.far_pos_sim_ppm >= ex.far_pos_sim_ppm


def test_q271_ann_recall_vs_exact(spark, sf_dir):
    """The registered ANN-fed miner (q271) vs its exact twin (q202):
    every anchor must be mined, subset bounds must hold anchor by
    anchor (ANN hard-neg sim <= exact argmax, ANN far-pos sim >=
    exact argmin), and the trained-quantizer candidate tier must
    actually find the exact hard negative for most anchors — the
    recall floor that makes 'ANN-fed' a quality claim, not an
    escape hatch (cf. the q53/q46 recall pins)."""
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    exact = {
        r.vec_id: r
        for r in reg["q202_hard_negatives"].fn(spark, sf_dir).collect()
    }
    ann = reg["q271_hard_negatives_ann"].fn(spark, sf_dir).collect()
    assert {r.vec_id for r in ann} == set(exact)
    hit = 0
    for r in ann:
        ex = exact[r.vec_id]
        if r.hard_neg_sim_ppm is not None:
            assert r.hard_neg_sim_ppm <= ex.hard_neg_sim_ppm
            if r.hard_neg_id == ex.hard_neg_id:
                hit += 1
        if r.far_pos_sim_ppm is not None:
            assert r.far_pos_sim_ppm >= ex.far_pos_sim_ppm
    assert hit / len(ann) >= 0.6, f"hard-neg recall {hit}/{len(ann)}"


def test_q276_ln_contract_bit_identity_vs_duckdb(spark, sf_dir, duck):
    """PIN the q276 cross-engine ln() contract (ADVICE r9): the
    oracle hash match assumes JVM Math.log and DuckDB ln() return
    BIT-IDENTICAL doubles on identical integer-ratio inputs. That is
    stronger than IEEE-754 guarantees (log is correct only to ~1 ulp
    per libm), and the DECIMAL(28,12) truncation can NOT absorb a
    1-ulp flip that straddles a truncation boundary — with ~1e4
    distinct ratios some WILL sit within an ulp of the 1e-12 grid.
    So the real contract is bit-identity, and this test checks it
    directly over every distinct (total, freq) ratio in the fixture
    vocabulary: if a platform's libm ever diverges, this fails with
    the offending ratio instead of an opaque hash mismatch (the same
    diagnosis pattern that got pow() replaced by sqrt())."""
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda t: t != "",
    )
    vocab = (
        table(spark, sf_dir, "documents")
        .select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    freqs = sorted({r.f for r in vocab.select("f").distinct().collect()})
    total = vocab.agg(F.sum("f")).collect()[0][0]
    spark_ln = (
        spark.createDataFrame([(int(f),) for f in freqs], "f long")
        .select(
            "f",
            F.log(F.lit(int(total)).cast("double") / F.col("f"))
            .alias("s"),
        )
        .collect()
    )
    duck_ln = {
        f: s
        for f, s in duck.execute(
            "SELECT f, ln(CAST(? AS DOUBLE) / f) FROM "
            "(SELECT unnest(?) AS f)",
            [int(total), [int(f) for f in freqs]],
        ).fetchall()
    }
    import struct

    for r in spark_ln:
        a = struct.pack("<d", r.s)
        b = struct.pack("<d", duck_ln[r.f])
        assert a == b, (
            f"ln({total}/{r.f}) differs across engines: "
            f"spark={r.s!r} duckdb={duck_ln[r.f]!r}"
        )


def test_kcore_nonconvergence_raises(spark):
    """kcore must REFUSE to publish a truncated (still-shrinking)
    edge set: with max_iters too small for the peel chain the result
    is not a k-core at all (ADVICE r9)."""
    from speculare_pgcdc_spark.operators.graph import kcore

    # a path graph peels one edge per round from each end: k=2 core
    # is empty but needs ~n/2 rounds to reach it
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "ua long, ub long"
    )
    with pytest.raises(RuntimeError, match="fixed point"):
        kcore(edges, 2, max_iters=2)
    core, iters = kcore(edges, 2, max_iters=30)
    assert core.count() == 0 and iters <= 30


def test_capped_cell_pairs_bounds_and_lossless_regime(spark):
    """The IVF candidate tier's occupancy bound (r9 verdict item 6):
    (a) a hot cell contributes at most `cap` candidates, so per-anchor
    pairs <= probes x cap; (b) with cap >= max occupancy the result
    is EXACTLY the uncapped join; (c) the md5 pick is deterministic;
    (d) the cap rides WindowGroupLimit (map-side partial heap), never
    a full per-cell sort."""
    from speculare_pgcdc_spark.plans import plan_string

    # one hot cell (0: 400 candidates) + one small cell (1: 20)
    c = spark.createDataFrame(
        [(i, 0) for i in range(400)]
        + [(1000 + i, 1) for i in range(20)],
        "cid long, _cell int",
    )
    a = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "aid long, _cell int"
    )
    capped = sim.capped_cell_pairs(a, c, cap=50)
    rows = capped.collect()
    from collections import Counter

    per_anchor = Counter(r.aid for r in rows)
    assert per_anchor[1] == 50 and per_anchor[2] == 50  # hot capped
    assert per_anchor[3] == 20  # small cell untouched
    # (b) lossless when cap >= occupancy
    full = {(r.aid, r.cid) for r in a.join(c, "_cell")
            .select("aid", "cid").collect()}
    uncapped = {
        (r.aid, r.cid)
        for r in sim.capped_cell_pairs(a, c, cap=400).collect()
    }
    assert uncapped == full
    # (c) determinism + capped set is a subset
    again = {(r.aid, r.cid) for r in capped.collect()}
    assert again == {(r.aid, r.cid) for r in rows} and again <= full
    # (d) map-side partial limit in the plan
    assert "WindowGroupLimit" in plan_string(capped)
    with pytest.raises(ValueError, match="cap >= 1"):
        sim.capped_cell_pairs(a, c, cap=0)


def test_q271_cap_inactive_at_fixture_occupancy(spark, sf_dir):
    """q271's HARDNEG_CELL_CAP must be INACTIVE on the fixtures (the
    cap is a skew guard, not a fixture behavior change): the capped
    candidate frame equals the plain same-cell join."""
    from speculare_pgcdc_spark.queries.corpus import (
        HARDNEG_ANCHORS,
        HARDNEG_CELL_CAP,
        HARDNEG_IVF_ITERS,
        HARDNEG_IVF_K,
        HARDNEG_IVF_PROBES,
    )

    e = table(spark, sf_dir, "embeddings")
    cents = sim.kmeans_centroids(
        e.select("vec_id", "embedding"),
        k=HARDNEG_IVF_K,
        iters=HARDNEG_IVF_ITERS,
    )
    cells = sim.assign_probe_cells(
        e, cents, probes=HARDNEG_IVF_PROBES
    ).select("vec_id", "_cell")
    occ = (
        cells.groupBy("_cell").count().agg(F.max("count")).collect()
    )[0][0]
    assert occ <= HARDNEG_CELL_CAP, (
        f"fixture cell occupancy {occ} exceeds the cap — the skew "
        "guard would change fixture results"
    )
    a_cells = cells.filter(F.col("vec_id") < HARDNEG_ANCHORS).select(
        F.col("vec_id").alias("aid"), "_cell"
    )
    c_cells = cells.select(F.col("vec_id").alias("cid"), "_cell")
    capped = {
        (r.aid, r.cid)
        for r in sim.capped_cell_pairs(
            a_cells, c_cells, HARDNEG_CELL_CAP
        ).collect()
    }
    plain = {
        (r.aid, r.cid)
        for r in a_cells.join(c_cells, "_cell")
        .select("aid", "cid")
        .collect()
    }
    assert capped == plain


def test_q284_mmr_greedy_invariants(spark, sf_dir):
    """Independent verification of the MMR greedy (q284 is rows-only
    by contract): recompute relevance and pairwise sims from the
    shortlist vectors and check, pick by pick, that (a) the recorded
    mmr_score equals lam*rel - (1-lam)*max-sim-to-previous, (b) no
    unpicked shortlist member scored strictly higher at that step
    (ties break to the smaller id), (c) pick 1 is the relevance
    argmax, and (d) lam=1e6 degrades to the plain cosine top-k."""
    import math

    from speculare_pgcdc_spark.queries import load_all
    from speculare_pgcdc_spark.queries.downstream import (
        MMR_K,
        MMR_LAM_PPM,
        MMR_SHORTLIST,
    )

    reg = load_all()
    picks = reg["q284_mmr_diversified_topk"].fn(spark, sf_dir).collect()
    assert [p.rank for p in picks] == list(range(1, MMR_K + 1))

    emb = table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    short = (
        sim.cosine_scores(emb.filter(F.col("vec_id") != 0), q)
        .select(
            "vec_id",
            "embedding",
            F.floor(F.col("cos") * 1_000_000).cast("bigint")
            .alias("rel_ppm"),
        )
        .orderBy(F.col("rel_ppm").desc(), "vec_id")
        .limit(MMR_SHORTLIST)
        .collect()
    )
    vecs = {r.vec_id: r.embedding for r in short}
    rel = {r.vec_id: r.rel_ppm for r in short}
    nrm = {
        i: math.sqrt(sum(x * x for x in v)) or 1.0
        for i, v in vecs.items()
    }

    def s_ppm(a, b):
        return math.floor(
            sum(x * y for x, y in zip(vecs[a], vecs[b]))
            / (nrm[a] * nrm[b])
            * 1_000_000
        )

    assert picks[0].vec_id == short[0].vec_id  # (c)
    chosen = []
    for p in picks:
        assert p.vec_id in vecs and p.rel_ppm == rel[p.vec_id]
        maxsim = max((s_ppm(p.vec_id, c) for c in chosen), default=0)
        score = (
            MMR_LAM_PPM * p.rel_ppm
            - (1_000_000 - MMR_LAM_PPM) * maxsim
        )
        assert p.mmr_score == score  # (a)
        for other in vecs:  # (b)
            if other in chosen or other == p.vec_id:
                continue
            om = max((s_ppm(other, c) for c in chosen), default=0)
            os_ = (
                MMR_LAM_PPM * rel[other]
                - (1_000_000 - MMR_LAM_PPM) * om
            )
            assert os_ < score or (
                os_ == score and other > p.vec_id
            ), f"greedy violated at rank {p.rank}"
        chosen.append(p.vec_id)
    # (d) lam=1e6 == plain relevance order over the shortlist
    plain = sim.mmr_topk(
        emb.filter(F.col("vec_id") != 0),
        q,
        k=MMR_K,
        shortlist=MMR_SHORTLIST,
        lam_ppm=1_000_000,
    ).collect()
    assert [p.vec_id for p in plain] == [r.vec_id for r in short[:MMR_K]]
    assert qv is not None


def test_mmr_diversifies_near_duplicates(spark):
    """The property MMR exists for: a shortlist whose top hits are
    near-duplicates must NOT all be picked consecutively once lam < 1
    — the duplicate's marginal score collapses."""
    # query is NOT a corpus member: vec 0 and its exact-duplicate 1
    # (a scalar multiple -> identical cosine) are most relevant, vec 2
    # is moderately relevant but orthogonal to them
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame(
        [([0.8, 0.6, 0.1, 0.0],)], "q array<double>"
    )
    picks = sim.mmr_topk(
        emb, q, k=3, shortlist=4, lam_ppm=500_000
    ).collect()
    ids = [p.vec_id for p in picks]
    assert ids[0] == 0  # relevance argmax (dup tie -> smaller id)
    assert ids[1] == 2, f"expected the diverse hit second, got {ids}"
    plain = sim.mmr_topk(
        emb, q, k=3, shortlist=4, lam_ppm=1_000_000
    ).collect()
    assert [p.vec_id for p in plain][:2] == [0, 1]  # dup family first
    with pytest.raises(ValueError, match="lam_ppm"):
        sim.mmr_topk(emb, q, lam_ppm=2_000_000)
    with pytest.raises(ValueError, match="exceeds shortlist"):
        sim.mmr_topk(emb, q, k=9, shortlist=4)


def test_round10_gates_are_not_vacuous(spark, sf_dir):
    """Round-10 queries must exercise both sides of their filters/
    thresholds on the fixtures (the q279-first-form lesson: a
    perfectly-ordered feed measured zero lateness and hash-matched a
    hollow green)."""
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    # q281: open (current) versions AND closed versions both exist
    scd = reg["q281_scd2_intervals"].fn(spark, sf_dir)
    n_open = scd.filter(F.col("valid_to").isNull()).count()
    n_closed = scd.filter(F.col("valid_to").isNotNull()).count()
    assert n_open > 0 and n_closed > 0
    # every key has exactly one open (current) version
    keys = scd.select("o_custkey").distinct().count()
    assert n_open == keys
    # q282: organic AND at least one touch channel both convert
    ch = {
        r.channel: r.n_purchases
        for r in reg["q282_last_touch_attribution"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert ch.get("organic", 0) > 0
    assert sum(v for k, v in ch.items() if k != "organic") > 0
    # q283: the l-gate fires on the tiny fixture; at larger scales
    # classes legitimately fill past l (min_l is still computed and
    # asserted sane — the audit reporting zero risk there is the
    # correct answer, not a hollow one)
    ld = reg["q283_l_diversity"].fn(spark, sf_dir).collect()[0]
    assert ld.n_groups > 0 and ld.min_l >= 1
    if "sf0.001" in sf_dir:
        assert ld.n_low_div > 0
    # q285: the corpus has repeated grams (rep_mass both > 0 and
    # < the all-identical extreme), and distinct < total
    dv = reg["q285_ngram_diversity"].fn(spark, sf_dir).collect()[0]
    assert 0 < dv.distinct_grams < dv.total_grams
    assert dv.rep_mass > 0
    # q286: entropy actually varies across docs
    ent = [
        r.entropy
        for r in reg["q286_char_bigram_entropy"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert len(ent) > 1 and min(ent) < max(ent)
    assert all(e >= 0 for e in ent)


def test_round10_batch2_gates_and_plan(spark, sf_dir):
    """q287-q289 gates + the q287 no-explode plan contract."""
    from speculare_pgcdc_spark.plans import plan_string
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    # q287: the CI must bracket the point estimate strictly and be
    # a real interval; and the Spark plan must NOT explode the data
    # (all replicates ride one scan's aggregates — the whole point)
    df = reg["q287_poisson_bootstrap_ci"].fn(spark, sf_dir)
    b = df.collect()[0]
    assert b.ci_lo_e2 < b.mean_e2 < b.ci_hi_e2
    p = plan_string(df)
    assert "Generate" not in p, "q287 must not explode replicates"
    # q288: est >= exact for every audited key (the CMS one-sided
    # guarantee); collisions actually occur at sf0.01+ (zero
    # overcount everywhere would mean the sketch was never stressed)
    rows = reg["q288_count_min_sketch"].fn(spark, sf_dir).collect()
    assert rows and all(r.overcount >= 0 for r in rows)
    if "sf0.001" not in sf_dir:
        assert any(r.overcount > 0 for r in rows)
        assert any(r.overcount == 0 for r in rows)
    # q289: conversion is partial (strictly between 0 and 100%) and
    # the percentiles are ordered
    t = reg["q289_time_to_convert"].fn(spark, sf_dir).collect()[0]
    assert 0 < t.n_converted < t.n_viewed
    assert 0 < t.conv_ppm < 1_000_000
    assert 0 <= t.median_delay_s <= t.p90_delay_s


def test_round10_batch3_gates(spark, sf_dir):
    """q290/q291 vacuity gates."""
    from speculare_pgcdc_spark.queries import load_all

    reg = load_all()
    # q290: per-source-type probabilities sum to ~1e6 (exact-DIV
    # floors make the sum land in (1e6 - n_targets, 1e6]), and the
    # matrix is genuinely non-uniform
    rows = reg["q290_markov_transitions"].fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r.prev_t].append(r.p_ppm)
    for src, ps in by_src.items():
        assert 1_000_000 - len(ps) < sum(ps) <= 1_000_000, src
    assert len({p for ps in by_src.values() for p in ps}) > 1
    # q291: impurity is computed (0 <= gini < 1e6), majority share
    # consistent with it, and the corpus has label mixture somewhere
    g = reg["q291_source_label_gini"].fn(spark, sf_dir).collect()
    assert g
    for r in g:
        assert 0 <= r.gini_ppm < 1_000_000
        assert r.majority_ppm * r.n_labels >= 1_000_000 - r.n_labels
        if r.n_labels == 1:
            assert r.gini_ppm == 0 and r.majority_ppm == 1_000_000
    assert any(r.gini_ppm > 0 for r in g), "no mixed source"
