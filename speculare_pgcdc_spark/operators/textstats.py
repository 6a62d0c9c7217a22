"""Text analysis operators for training-data pipelines (SURVEY §7 M5):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure column expressions (whole-stage codegen) so each
is a narrow map over the corpus — embarrassingly parallel at 100 TB.

Every formula is deliberately SQL-mirrorable so the DuckDB oracle can
recompute it exactly (queries/llm.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: marker-token language heuristic: first language whose marker appears
#: wins; 'unk' otherwise. (A real n-gram profile model slots in here —
#: same shape: deterministic text -> label expression.)
LANG_MARKERS = [
    ("en", " the "),
    ("de", " der "),
    ("es", " el "),
    ("fr", " le "),
]

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def lang_guess(text: Column) -> Column:
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    expr = F.lit("unk")
    for lang, marker in reversed(LANG_MARKERS):
        expr = F.when(padded.contains(marker), F.lit(lang)).otherwise(expr)
    return expr


def _toks(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def _bind(col: Column, f) -> Column:
    """Evaluate ``col`` ONCE and hand it to ``f`` as a lambda variable:
    ``element_at(transform(array(col), f), 1)`` ≡ ``f(col)`` for any
    value (including NULL). Referencing a Column OBJECT several times
    copies its whole expression subtree per reference — and each copy
    of a higher-order function carries fresh lambda-variable ExprIds,
    so codegen's subexpression elimination cannot merge them; a
    builder that mentions ``_toks(text)`` three times tokenizes every
    row three times (r14: q88's generator held SEVEN split copies). A
    lambda VARIABLE is a bound attribute — evaluated once, referenced
    freely."""
    return F.element_at(F.transform(F.array(col), f), 1)


def token_count_ws(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(_toks(text)).cast("bigint")


def token_count_re(text: Column) -> Column:
    """Regex word-token count (a BPE-ish pre-tokenizer stand-in)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+"), 0)).cast(
        "bigint"
    )


def _stopword_ratio_of(tk: Column) -> Column:
    stops = F.filter(tk, lambda t: t.isin(*STOPWORDS))
    return F.size(stops) / F.greatest(F.size(tk), F.lit(1))


def _stopword_ratio_raw(text: Column) -> Column:
    # _bind: the ratio reads the token array twice (filter + size);
    # binding tokenizes once (r14)
    return _bind(_toks(text), _stopword_ratio_of)


def stopword_ratio(text: Column) -> Column:
    return F.round(_stopword_ratio_raw(text), 4)


def avg_token_len(text: Column) -> Column:
    def _avg_of(tk: Column) -> Column:
        total = F.aggregate(
            F.transform(tk, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return total / F.greatest(F.size(tk), F.lit(1))

    return F.round(_bind(_toks(text), _avg_of), 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality signal: length prior + stopword prior.
    Deterministic arithmetic only — mirrored in SQL by the oracle.
    Composes RAW (unrounded) terms; rounds exactly once at the end.
    One tokenize per row: both terms read one bound token array
    (_bind — the naive composition split the text three times)."""

    def _score_of(tk: Column) -> Column:
        len_term = F.least(
            F.size(tk).cast("double") / 20.0, F.lit(1.0)
        )
        stop_term = F.lit(1.0) - _stopword_ratio_of(tk)
        return (len_term + stop_term) / 2.0

    return F.round(_bind(_toks(text), _score_of), 4)


def fingerprint(text: Column, length: int = 16) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text
    (lower + trim), truncated. Identical in Spark and DuckDB."""
    return F.substring(F.md5(F.lower(F.trim(text))), 1, length)


def rolling_hashes(text_col: str = "text", k: int = 8) -> Column:
    """Polynomial rolling hash of every k-gram: hash(i) = sum_j
    ascii(text[i+j]) * 31^j. No modulus: for k<=8 the value is
    < 2^45, exact in BIGINT in any engine (the cross-engine-oracle
    requirement). Pure higher-order column functions — whole-stage
    codegen, no Python, one narrow pass per document."""
    if not 1 <= k <= 11:
        # 31^(k-1) must stay exactly representable in a double (< 2^53)
        # for pow() -> BIGINT to be lossless in every engine; k=12 puts
        # 31^11 past that and the hashes silently diverge cross-engine
        raise ValueError(f"k must be in [1, 11], got {k}")
    # NB: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — a
    # text shorter than k must short-circuit to array() or it grows
    # phantom hashes of out-of-range substrings
    return F.expr(
        f"CASE WHEN length({text_col}) >= {k} THEN"
        f" transform(sequence(1, length({text_col}) - {k - 1}),"
        f"  i -> aggregate(sequence(0, {k - 1}), CAST(0 AS BIGINT),"
        f"   (acc, j) -> acc + CAST(ascii(substring({text_col}, i + j, 1))"
        f"    AS BIGINT) * CAST(pow(31, j) AS BIGINT)))"
        f" ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )


def rolling_fingerprint(
    text_col: str = "text", k: int = 8, bottom: int = 4
) -> Column:
    """Bottom-k rolling-hash fingerprint: the `bottom` smallest distinct
    k-gram hashes, joined to a string. A bottom-k sketch over shingle
    hashes is an unbiased Jaccard estimator (same family as MinHash),
    so equal/near-equal fingerprints flag near-duplicate content; the
    fingerprint is shift-invariant (insertion early in a doc shifts
    positions but leaves most k-gram hashes, hence usually the minima,
    intact) — the property md5-style whole-content hashing lacks."""
    return F.array_join(
        F.slice(
            F.array_sort(F.array_distinct(rolling_hashes(text_col, k))),
            1,
            bottom,
        ),
        ",",
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Consecutive word n-grams of the whitespace tokens, each joined
    with single spaces. NB: ``sequence(1, m)`` with m < 1 is DESCENDING
    in Spark, not empty — texts with fewer than `n` tokens must
    short-circuit to an empty array or they grow phantom n-grams."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def _grams_of(tk: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.array_join(F.slice(tk, i, n), " "),
        )
        return F.when(F.size(tk) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    # _bind: the builder reads the token array three times (sequence
    # bound, slice lambda, short-circuit guard); binding tokenizes
    # once (r14 — size() over the bound array is O(1))
    return _bind(_toks(text), _grams_of)


def repetition_counts(text: Column, n: int = 2) -> dict[str, Column]:
    """Gopher-style repetition signal (Rae et al. 2021, "Scaling
    Language Models", repetition filters): how much of a document is
    duplicated n-grams. All counts are INTEGER columns — a dup-fraction
    ratio of two ints can land on a .xxxx5 rounding tie that Spark and
    an oracle engine break differently, so the exact counts are the
    contract and any float ratio is derived by the caller.

    Returns column map: n_tok, n_tok_distinct, n_gram, n_gram_distinct.

    n_gram deliberately does NOT materialize the gram array: the total
    n-gram count is the arithmetic identity max(n_tok - n + 1, 0), so
    only n_gram_distinct pays for gram assembly. Catalyst's project
    collapsing inlines every column's full expression tree, and the
    duplicated gram tree doubled the one-time expression-compilation
    cost the driver's one-shot sweep pays per query (measured 6.1 s ->
    3.0 s cold at sf0.01, values identical — round 11)."""
    t = F.coalesce(text, F.lit(""))
    toks = _toks(t)
    grams = word_ngrams(t, n)
    return {
        "n_tok": F.size(toks).cast("bigint"),
        "n_tok_distinct": F.size(F.array_distinct(toks)).cast("bigint"),
        "n_gram": F.when(F.size(toks) >= n, F.size(toks) - n + 1)
        .otherwise(F.lit(0)).cast("bigint"),
        "n_gram_distinct": F.size(F.array_distinct(grams)).cast("bigint"),
    }


def chunk_texts(
    docs: DataFrame,
    chunk: int = 50,
    stride: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into overlapping training
    chunks of `chunk` tokens every `stride` tokens (overlap =
    chunk - stride) — the context-window packing stage of a training
    pipeline. Returns (id, chunk_idx, n_tok_chunk, fp): the md5-prefix
    fingerprint stands in for the chunk text so downstream exact-dedup
    can run on chunks without materializing them twice.

    Chunk count is exact integer arithmetic: 1 for docs up to `chunk`
    tokens, else 1 + ceil((n_tok - chunk) / stride) (final chunk may
    be short); zero-token docs yield NO rows — guarded, since
    sequence(0, -1) is DESCENDING in Spark, not empty. Pure array
    expressions + one posexplode: a narrow 1:N map, no shuffle."""
    if chunk < 1 or stride < 1:
        raise ValueError(f"chunk/stride must be >= 1: {chunk}/{stride}")
    if stride > chunk:
        # a gap between windows would (a) leave tokens covered by NO
        # chunk and (b) let the final slice start past the doc end,
        # emitting a phantom empty chunk whose md5('') fingerprint
        # cross-matches every other phantom in chunk-level dedup
        raise ValueError(
            f"stride ({stride}) must be <= chunk ({chunk}): "
            "windows must tile the token stream without gaps"
        )
    t = F.coalesce(F.col(text_col), F.lit(""))

    # _bind: the generator read the token array seven times (the nch
    # CASE twice over, the sequence bound, the slice lambda); binding
    # tokenizes once per row (r14 — see _bind)
    def _chunks_of(tk):
        n = F.size(tk)
        nch = (
            F.when(n <= 0, F.lit(0))
            .when(n <= chunk, F.lit(1))
            .otherwise(1 + F.floor((n - chunk + stride - 1) / F.lit(stride)))
        )
        return F.when(
            nch > 0,
            F.transform(
                F.sequence(F.lit(0), (nch - 1).cast("int")),
                lambda i: F.array_join(
                    F.slice(tk, i * stride + 1, chunk), " "
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    chunks = _bind(_toks(t), _chunks_of)
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_chunk")
    ).select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(F.split("_chunk", " ")).cast("bigint").alias(
            "n_tok_chunk"
        ),
        fingerprint(F.col("_chunk")).alias("fp"),
    )


def text_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All stats in one narrow projection."""
    t = F.col(text_col)
    return docs.withColumns(
        {
            "lang_guess": lang_guess(t),
            "n_tok_ws": token_count_ws(t),
            "n_tok_re": token_count_re(t),
            "stop_ratio": stopword_ratio(t),
            "avg_tok_len": avg_token_len(t),
            "quality": quality_score(t),
            "fp": fingerprint(t),
        }
    )


def winnow_fingerprints(
    text_col: str = "text", k: int = 8, w: int = 8
) -> Column:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): the distinct minima of every w-length window over the
    k-gram rolling hashes. Guarantee: any shared substring of length
    >= k + w - 1 contributes at least one IDENTICAL fingerprint to
    both documents REGARDLESS of alignment — the property strided
    sampling lacks (a copy at an offset not divisible by the stride
    is invisible to it). Density is ~2/(w+1) of all positions, so
    the fingerprint set is ~4x smaller than the full hash set while
    keeping the detection guarantee. Pure array expressions over
    rolling_hashes — narrow, codegen'd, no explode until the caller
    chooses to join. Docs with fewer than w windows (length <
    k + w - 1) fingerprint to an empty array.

    The hash array is BOUND ONCE via a 1-element-array transform:
    textually inlining the rolling_hashes expression into every
    window's slice() would recompute the whole hash array per
    position -- measured ~25x slower on the fixture corpus."""
    h = rolling_hashes(text_col, k)
    bound = F.transform(
        F.array(h),
        lambda harr: F.when(
            F.size(harr) >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(harr) - (w - 1)),
                    lambda i: F.array_min(F.slice(harr, i, w)),
                )
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    return F.element_at(bound, 1)
