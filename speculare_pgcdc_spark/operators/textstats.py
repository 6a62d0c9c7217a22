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


def token_count_ws(text: Column) -> Column:
    """Whitespace tokenization count."""
    return F.size(_toks(text)).cast("bigint")


def token_count_re(text: Column) -> Column:
    """Regex word-token count (a BPE-ish pre-tokenizer stand-in)."""
    return F.size(F.regexp_extract_all(text, F.lit("[a-z]+"), 0)).cast(
        "bigint"
    )


def _stopword_ratio_raw(text: Column) -> Column:
    toks = _toks(text)
    stops = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(stops) / F.greatest(F.size(toks), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    return F.round(_stopword_ratio_raw(text), 4)


def avg_token_len(text: Column) -> Column:
    toks = _toks(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 4)


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality signal: length prior + stopword prior.
    Deterministic arithmetic only — mirrored in SQL by the oracle.
    Composes RAW (unrounded) terms; rounds exactly once at the end."""
    n = token_count_ws(text)
    len_term = F.least(n.cast("double") / 20.0, F.lit(1.0))
    stop_term = F.lit(1.0) - _stopword_ratio_raw(text)
    return F.round((len_term + stop_term) / 2.0, 4)


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
