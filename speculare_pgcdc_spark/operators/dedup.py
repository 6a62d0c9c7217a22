"""Deduplication operators for large-scale text corpora.

Four tiers, all pure DataFrame ops (JVM-side, shuffle-conscious):

- exact: dropDuplicates / md5-fingerprint keyed dedup
- token-set Jaccard (exact pairwise over shared tokens) — the oracle
  path; quadratic in docs-per-shared-token, so the scale path is:
- MinHash + LSH banding: signatures via k seeded xxhash64 mins (one
  explode + one groupBy), candidate pairs via band-bucket self-join,
  then EXACT Jaccard verification of candidates only. At 100 TB this is
  the standard near-dup architecture: cost is bounded by bucket sizes,
  not corpus^2.
- SimHash: 64-bit per-doc signature via bitwise majority vote of token
  hashes; near-dups = small Hamming distance. Signature computation is
  64 conditional sums inside one hash aggregate (no shuffle beyond the
  doc groupBy).

Reference analog: none (the reference has no batch analytics); this is
the LLM-data-pipeline extension mandated by the build plan (SURVEY §7 M5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (id, tok) pairs; empty tokens dropped.

    r14 measurement note: a catalog.spread_scan of the input (to widen
    the fixtures' single-task scan) was A/B'd interleaved and REVERTED
    — single-token explode + partial-distinct is too cheap per row for
    the extra round-robin exchange to pay (q42 +47%, q79 +43%, q46
    +16% per-round ratio medians); the spread wins only on the heavy
    per-row families (8-gram explode, md5 stack — see q324/q87/q265)."""
    return (
        docs.select(
            F.col(id_col), F.explode(F.split(text_col, " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )


def char_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct character n-gram shingles per doc (generator expression;
    no Python). Texts shorter than n yield NO rows — sequence(1, 0) is
    DESCENDING [1, 0] in Spark, not empty, so the short case must
    short-circuit or sub-n docs fabricate shingles and all pair up as
    near-duplicates."""
    sh = F.expr(
        f"CASE WHEN length({text_col}) >= {n} THEN"
        f" transform(sequence(1, length({text_col}) - {n - 1}),"
        f"  i -> substring({text_col}, i, {n}))"
        f" ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("tok"))
        .distinct()
    )


def jaccard_pairs(
    tok: DataFrame, threshold: float, id_col: str = "doc_id"
) -> DataFrame:
    """Exact pairwise token-set Jaccard >= threshold over docs sharing at
    least one token. Returns (da, db, j) with da < db.

    Scale note: per-token join fan-out is sum(n_t^2); usable when token
    document-frequencies are bounded (stopword filtering / df-capping
    upstream) — otherwise use minhash_lsh_pairs below.

    The token table feeds THREE consumers (both join sides + sizes);
    without materialization Spark recomputes the tokenize subtree per
    consumer (Catalyst does not CSE across the DAG — q46's plan showed
    10 source scans). One eager localCheckpoint = one tokenize pass;
    at cluster scale the same role is played by persist(DISK) or a
    reliable checkpoint before any multi-pass reuse.
    """
    tok = tok.localCheckpoint(eager=True)
    a = tok.select(F.col(id_col).alias("da"), "tok")
    b = tok.select(F.col(id_col).alias("db"), "tok")
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    inter = (
        a.join(b, ["tok"])
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("db"), F.col("n").alias("nb"))
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "da")
        .join(sb, "db")
        .withColumn("j", j)
        .filter(F.col("j") >= threshold)
        .select("da", "db", F.round("j", 4).alias("j"))
    )


def _minhash_parts(num_hashes: int):
    """The ONE definition of the MinHash signature: per-hash min
    aggregates (seeded xxhash64 over tokens) plus the array packing.
    Both minhash_signatures and minhash_lsh_pairs build from this, so
    seeding/layout can never silently fork between them."""
    mins = [
        F.min(F.xxhash64("tok", F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    return mins, sig


def minhash_signatures(
    tok: DataFrame, num_hashes: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """(id, signature array<bigint>) — k independent min-hashes via
    seeded xxhash64 over tokens. One hash aggregate; k mins computed
    map-side in a single pass."""
    mins, sig = _minhash_parts(num_hashes)
    return tok.groupBy(id_col).agg(*mins).select(
        F.col(id_col), sig.alias("signature")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 8,
    rows: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Banding: docs sharing any band of the signature become a candidate
    pair (da < db). bands*rows must equal the signature length.

    The self-join is keyed on (band, band_hash) so fan-out is bounded by
    bucket occupancy — the property that makes this viable at 100 TB.
    """
    band_hash = F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> xxhash64(b, slice(signature, b * {rows} + 1, {rows})))"
    )
    buckets = signatures.select(
        F.col(id_col),
        F.posexplode(band_hash).alias("band", "bhash"),
    )
    a = buckets.select(F.col(id_col).alias("da"), "band", "bhash")
    b = buckets.select(F.col(id_col).alias("db"), "band", "bhash")
    return (
        a.join(b, ["band", "bhash"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )


def verify_candidate_jaccard(
    cands: DataFrame,
    tok: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard computed for CANDIDATE pairs only: semi-join each
    side's tokens down to candidate docs, intersect per pair, rejoin
    sizes. Cost is O(candidate docs' tokens), independent of corpus
    pair count — the whole point of LSH pre-filtering.

    ``sizes`` (id, n) can be precomputed by the caller (e.g. ridden
    along the signature aggregate) so the token table isn't re-
    aggregated here; when None it is derived from ``tok``."""
    a_tok = tok.select(F.col(id_col).alias("da"), "tok").join(
        cands.select("da").distinct(), "da", "left_semi"
    )
    b_tok = tok.select(F.col(id_col).alias("db"), "tok").join(
        cands.select("db").distinct(), "db", "left_semi"
    )
    inter = (
        cands.join(a_tok, "da")
        .join(b_tok, ["db", "tok"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    if sizes is None:
        sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col(id_col).alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("db"), F.col("n").alias("nb"))
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "da")
        .join(sb, "db")
        .withColumn("j", j)
        .filter(F.col("j") >= threshold)
        .select("da", "db", F.round("j", 4).alias("j"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact
    Jaccard verification of the candidates ONLY (never the full
    quadratic pair set). Output (da, db, j) is a subset of
    jaccard_pairs(...) limited by LSH recall (tunable via bands/rows).

    Materialization strategy (the multi-pass reuse problem): the token
    table feeds the signature aggregate AND both verify sides AND the
    size lookup; Catalyst has no cross-DAG CSE, so an unmaterialized
    plan re-tokenizes per consumer (measured: 10 source scans). So —
    tokenize ONCE (eager localCheckpoint), ride the per-doc size on
    the same aggregate that builds the signature (one shuffle serves
    both), and pin the small candidate-pair set before its three
    consumers. At cluster scale the checkpoints map to persist(DISK)
    /reliable checkpoints; the pass structure is what matters."""
    rows = num_hashes // bands
    tok = tokens(docs, id_col, text_col).localCheckpoint(eager=True)
    mins, sig = _minhash_parts(num_hashes)
    sig_n = (
        tok.groupBy(id_col)
        .agg(*mins, F.count(F.lit(1)).alias("n"))
        .select(F.col(id_col), sig.alias("signature"), "n")
        .localCheckpoint(eager=True)
    )
    cands = lsh_candidate_pairs(
        sig_n.select(id_col, "signature"), bands, rows, id_col
    ).localCheckpoint(eager=True)
    return verify_candidate_jaccard(
        cands, tok, threshold, id_col, sizes=sig_n.select(id_col, "n")
    )


def simhash64(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: for each bit, majority vote (+1/-1) of the
    token xxhash64 bits; bit set when the vote is positive."""
    tok = tokens(docs, id_col, text_col).withColumn(
        "h", F.xxhash64("tok")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def df_capped_tokens(
    tok: DataFrame, max_df: int, id_col: str = "doc_id"
) -> DataFrame:
    """Drop tokens whose document frequency exceeds max_df before any
    pairwise work. The per-token join fan-out of jaccard_pairs is
    sum(df_t^2), so stopword-class tokens (df ~ corpus size) dominate
    quadratically; capping df bounds the fan-out to corpus * max_df —
    the standard prefilter that keeps exact token-Jaccard usable at
    scale (near-dup pairs share RARE tokens; dropping ubiquitous ones
    barely moves the estimate and only ever LOWERS recall, never
    precision of the verified score)."""
    df_counts = tok.groupBy("tok").agg(
        F.countDistinct(id_col).alias("_df")
    )
    keep = df_counts.filter(F.col("_df") <= max_df).select("tok")
    return tok.join(keep, "tok", "left_semi")


def dup_components(
    pairs: DataFrame,
    a_col: str = "da",
    b_col: str = "db",
    max_iter: int = 20,
    driver_limit: int = 200_000,
) -> DataFrame:
    """Connected components over near-dup pairs -> dedup CLUSTERS: the
    step that turns pairwise output (jaccard_pairs / minhash_lsh_pairs)
    into a keep-one-per-group decision. Returns (id, component) for
    every doc appearing in >= 1 pair, component = MIN doc id in the
    component (so `id == component` selects the canonical survivor);
    singleton docs never enter and need no row.

    Two strategies, same result:

    - Edge lists up to `driver_limit` pairs run union-find ON THE
      DRIVER (one count + one collect of two-long rows). Near-dup
      edge lists are tiny relative to the corpus — 100 TB of text
      yields pairs proportional to the DUPLICATED subset — so this is
      the common production case, and it avoids per-round job
      overhead entirely.
    - Larger graphs run distributed min-label propagation: each node
      starts labeled with its own id; per round every node takes
      min(own label, neighbor labels) — a groupBy-min plus one
      equi-join per round, converging in graph-diameter rounds
      (near-dup clusters are short-diameter, so 2-4 rounds in
      practice; `max_iter` bounds adversarial chains). Every round is
      localCheckpoint'ed so the logical plan stays O(1) per round —
      lineage otherwise doubles each iteration and the analyzer OOMs
      near round 15; the convergence count is then a block-scan over
      the checkpointed round, no recompute. Alternating large-star/
      small-star halves the round count if diameters grow.

    Set driver_limit=0 to force the distributed path.
    """
    if driver_limit:
        # cache the (possibly expensive) pair computation across the
        # size probe and whichever strategy consumes it
        pairs = pairs.persist()
        try:
            if pairs.count() <= driver_limit:
                return _components_driver(pairs, a_col, b_col)
            return _components_distributed(pairs, a_col, b_col, max_iter)
        finally:
            pairs.unpersist()
    return _components_distributed(pairs, a_col, b_col, max_iter)


def _components_driver(
    pairs: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Union-find by min root over a collected (small) edge list."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in pairs.select(a_col, b_col).collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # min root so the label IS the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(x, find(x)) for x in parent]
    id_type = dict(pairs.dtypes)[a_col]
    return pairs.sparkSession.createDataFrame(
        out, f"id {id_type}, comp {id_type}"
    )


def _components_distributed(
    pairs: DataFrame, a_col: str, b_col: str, max_iter: int
) -> DataFrame:
    # Each round references the previous round's DataFrame twice (once
    # through nbr, once directly), so lineage DOUBLES per round —
    # persist() caches data but not the logical plan, and by ~15 rounds
    # the analyzer itself OOMs. localCheckpoint(eager) per round cuts
    # the plan back to a leaf: O(1) plan size per round is what lets
    # this loop run to graph-diameter depth on a real cluster too.
    sym = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("comp").alias("_nmin"))
        )
        # carry the old label so convergence is read off the
        # checkpointed round (a block-scan count, no recompute)
        nxt = (
            labels.select("id", F.col("comp").alias("_old"))
            .join(nbr, F.col("id") == nbr["src"], "left")
            .select(
                "id",
                "_old",
                F.least(
                    F.col("_old"),
                    F.coalesce("_nmin", F.col("_old")),
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.filter(F.col("comp") != F.col("_old")).count()
        labels = nxt  # old round's blocks are GC-released
        if changed == 0:
            break
    if changed != 0:
        # labels are mid-propagation: returning them would split
        # real components into multiple "canonical" survivors and
        # let duplicates through SILENTLY — fail instead
        raise RuntimeError(
            f"dup_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): the duplicate "
            f"graph has a longer diameter than max_iter — raise it"
        )
    return labels.select("id", "comp")


def contaminated_docs(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check (the decontamination stage of a
    pretraining pipeline): for each training doc, how many of its
    distinct word n-grams appear in ANY eval-set doc. Returns
    (id, n_grams, n_hit) — INTEGER counts, so the caller derives any
    overlap-fraction flag with a rounding-tie-free integer
    cross-multiply.

    Scale shape: the eval side (benchmarks, at most millions of
    n-grams) collapses to a distinct gram set and BROADCASTS; the
    corpus side is ONE gram construction + explode + mark-join + hash
    agg — total and hit counts ride the same agg, and map-side
    partial aggregation collapses the shuffle to doc grain before it
    leaves the scan stage.

    Round-14 measurement note (r13 verdict #8 pursued, then reverted
    on evidence): a broadcast LEFT SEMI gram prefilter with n_grams
    as a scan-grain size() was implemented and benched — 6.2s vs this
    shape's 2.2s at sf0.1, and 2.8x at 10x/100x probes — because the
    filter predicate and the second branch re-inline the gram
    construction ~4x (Catalyst pushes the size() filter into the scan
    and collapses projections), and gram CONSTRUCTION, not the
    already-doc-grain shuffle, dominates this operator. A one-build
    explode-the-column variant (size + explode in one projection)
    still lost at 3.7s: carrying the array through Generate costs
    more than the mark-join agg it saves. The single-build
    mark-and-count below is the measured optimum; its train-leg
    shuffle is bounded by docs x partitions, not grams, via the
    partial_count/partial_sum combine."""
    from speculare_pgcdc_spark.catalog import spread_scan
    from speculare_pgcdc_spark.operators.textstats import word_ngrams

    t = F.coalesce(F.col(text_col), F.lit(""))
    # r14: gram CONSTRUCTION dominates this operator (see the note
    # below), and a single-row-group input scans as ONE task — spread
    # both sides' raw projections so the tokenize + explode run at
    # session parallelism (counts are order-exact downstream)
    train = spread_scan(docs.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(t, n))).alias("_g"),
    )
    ev = (
        spread_scan(eval_docs.select(text_col))
        .select(
            F.explode(F.array_distinct(word_ngrams(t, n))).alias("_g")
        )
        .distinct()
    )
    # ONE pass: a left join against the (distinct) broadcast eval set
    # marks each gram, so total and hit counts ride the same agg — the
    # corpus-side gram construction is the expensive part and must not
    # run twice
    marked = ev.withColumn("_hit", F.lit(1))
    return (
        train.join(F.broadcast(marked), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0))
            .cast("bigint")
            .alias("n_hit"),
        )
    )


def prefix_filter_pairs(
    tok: DataFrame,
    tau_num: int,
    tau_den: int,
    id_col: str = "doc_id",
    assume_distinct: bool = False,
) -> DataFrame:
    """Exact Jaccard >= tau_num/tau_den pairs via PREFIX FILTERING (the
    PPJoin/AllPairs family) — lossless, unlike the probabilistic LSH
    paths: order every doc's tokens by global rarity (df asc, tok asc
    — a TOTAL order), keep only the first ``n - ceil(tau*n) + 1``
    tokens as the doc's prefix, and generate candidates from prefix
    tokens alone. The lemma: order tokens globally and let t be the
    smallest common token of a qualifying pair; if t were outside A's
    prefix, the whole intersection would fit in A's suffix of size
    ceil(tau*|A|) - 1 < tau*|A| <= |A ∩ B| — contradiction; so every
    qualifying pair shares a token in BOTH prefixes and survives the
    prefix self-join. Rare-first ordering then makes those prefix
    tokens the LOW-df ones, so candidate fan-out is bounded by rare-df
    squared instead of stopword-df squared — the property that lets an
    EXACT similarity join run at corpus scale.

    Thresholds are integer-exact end to end: prefix length uses
    ``ceil(tau*n) = (tau_num*n + tau_den - 1) DIV tau_den`` and the
    final test is ``(tau_den + tau_num) * i >= tau_num * (na + nb)``
    (both sides BIGINT), so no float tau can flip a boundary pair
    between engines.

    The math requires DISTINCT (id, tok) pairs — duplicate tokens
    inflate both df and per-doc sizes and void the prefix lemma. The
    operator enforces that with a ``.distinct()`` by default; callers
    whose input is already set-shaped (e.g. ``dedup.tokens``) pass
    ``assume_distinct=True`` to skip the redundant shuffle.
    """
    from pyspark.sql import Window

    if not (0 < tau_num <= tau_den):
        raise ValueError(f"need 0 < tau_num <= tau_den, got "
                         f"{tau_num}/{tau_den}")
    if not assume_distinct:
        tok = tok.select(id_col, "tok").distinct()
    tok = tok.localCheckpoint(eager=True)
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    sizes = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(id_col).orderBy("df", "tok")
    ranked = (
        tok.join(dfreq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, id_col)
    )
    plen = (
        F.col("n")
        - F.expr(f"({tau_num} * n + {tau_den} - 1) DIV {tau_den}")
        + F.lit(1)
    )
    prefix = ranked.filter(F.col("rn") <= plen).select(id_col, "tok")
    cands = (
        prefix.select(F.col(id_col).alias("da"), "tok")
        .join(
            prefix.select(F.col(id_col).alias("db"), "tok"), ["tok"]
        )
        .filter(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    ta = tok.select(F.col(id_col).alias("da"), "tok")
    tb = tok.select(F.col(id_col).alias("db"), "tok")
    inter = (
        cands.join(ta, "da")
        .join(tb, ["db", "tok"])
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("db"), F.col("n").alias("nb"))
    keep = (
        F.lit(tau_den + tau_num) * F.col("i")
        >= F.lit(tau_num) * (F.col("na") + F.col("nb"))
    )
    return (
        inter.join(sa, "da")
        .join(sb, "db")
        .filter(keep)
        .select(
            "da",
            "db",
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")),
                4,
            ).alias("j"),
        )
    )
