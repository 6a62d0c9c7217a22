"""PII scrubbing operators for training-data pipelines: deterministic
regex redaction of digits / emails with redaction accounting. A
pretraining corpus pass must both REMOVE identifiers and REPORT how
much it removed (the audit trail), so every redactor here has a
counting twin.

All pure `regexp_replace` column expressions — whole-stage codegen,
narrow maps, embarrassingly parallel at 100 TB. Patterns stay in the
char-class subset that Java regex (Spark) and RE2 (DuckDB et al.)
interpret identically, so the oracle can mirror them; NB DuckDB's
`regexp_replace` needs the explicit `'g'` flag to match Spark's
replace-all default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIGIT_RE = "[0-9]"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"


def redact_digits(c: Column, keep_last: int = 0) -> Column:
    """Mask every digit with 'X', optionally keeping the trailing
    `keep_last` characters verbatim (the credit-card/phone "last 4"
    disclosure policy)."""
    if keep_last < 0:
        raise ValueError(f"keep_last must be >= 0, got {keep_last}")
    masked_all = F.regexp_replace(c, DIGIT_RE, "X")
    if keep_last == 0:
        return masked_all
    n = F.length(c)
    head = F.substring(c, F.lit(1), F.greatest(n - keep_last, F.lit(0)))
    tail = F.substring(
        c, F.greatest(n - keep_last + 1, F.lit(1)), F.lit(keep_last)
    )
    short = n <= keep_last
    return F.when(short, c).otherwise(
        F.concat(F.regexp_replace(head, DIGIT_RE, "X"), tail)
    )


def digit_count(c: Column) -> Column:
    """How many characters :func:`redact_digits` (keep_last=0) would
    mask — the audit counter."""
    return (
        F.length(c) - F.length(F.regexp_replace(c, DIGIT_RE, ""))
    ).cast("bigint")


def redact_emails(c: Column, token: str = "<EMAIL>") -> Column:
    """Replace email-shaped spans with a fixed token."""
    return F.regexp_replace(c, EMAIL_RE, token)


def email_count(c: Column) -> Column:
    """How many email-shaped spans occur in the text."""
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)).cast(
        "bigint"
    )
