"""UDF surface (SURVEY §2B X1-X4, queries Q40-Q41).

Policy: Python rounds NOTHING — UDFs return raw doubles and the final
ROUND happens in SQL on both engines (identical HALF_UP-on-BigDecimal vs
away-from-zero semantics on the values involved), so pandas' banker's
rounding can never diverge from the oracle.

Scale: X1 (row-at-a-time udf) is registered for surface completeness but
the Arrow-batched pandas variants are the production path (~10-100x).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from speculare_pgcdc_spark.catalog import table
from speculare_pgcdc_spark.queries import register

_Q40_ORACLE = """
    SELECT event_id, ROUND(value * 2 + 1, 2) AS v2
    FROM events ORDER BY event_id
"""


@register(
    "q40_pandas_udf",
    oracle=_Q40_ORACLE,
    doc="X2 vectorized (Arrow-batched) pandas UDF; transform stays in "
    "pandas, rounding stays in SQL.",
)
def q40a(spark: SparkSession, sf: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def affine(v: pd.Series) -> pd.Series:
        return v * 2 + 1

    return (
        table(spark, sf, "events")
        .select("event_id", F.round(affine("value"), 2).alias("v2"))
        .orderBy("event_id")
    )


@register(
    "q40_python_udf",
    oracle=_Q40_ORACLE,
    doc="X1 row-at-a-time Python UDF — same result as the pandas path "
    "(pinned by the shared oracle); kept off every hot path.",
)
def q40b(spark: SparkSession, sf: str) -> DataFrame:
    affine = F.udf(lambda v: None if v is None else v * 2 + 1, DoubleType())
    return (
        table(spark, sf, "events")
        .select("event_id", F.round(affine("value"), 2).alias("v2"))
        .orderBy("event_id")
    )


@register(
    "q41_grouped_map_zscore",
    oracle="""
        SELECT event_id,
               ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                   / STDDEV_SAMP(value) OVER (PARTITION BY event_type),
                   4) AS z
        FROM events ORDER BY event_id
    """,
    doc="X3 grouped-map UDF (applyInPandas): per-group z-score with "
    "pandas mean/std(ddof=1) == SQL AVG/STDDEV_SAMP. One shuffle on "
    "the group key; Arrow both ways. Groups must fit in executor "
    "memory — acceptable here (bounded event_type cardinality), "
    "documented as the applyInPandas contract.",
)
def q41a(spark: SparkSession, sf: str) -> DataFrame:
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        pdf = pdf[["event_id"]].copy()
        pdf["z"] = (v - v.mean()) / v.std(ddof=1)
        return pdf

    return (
        table(spark, sf, "events")
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, "event_id bigint, z double")
        .select("event_id", F.round("z", 4).alias("z"))
        .orderBy("event_id")
    )


@register(
    "q41_grouped_agg_udaf",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="X4 UDAF via pandas_udf GROUPED_AGG: integer-cents sum (exact in "
    "int64, so pandas vs SQL aggregation order cannot diverge).",
)
def q41b(spark: SparkSession, sf: str) -> DataFrame:
    @F.pandas_udf("bigint")
    def cents_sum(v: pd.Series) -> int:
        import numpy as np

        # half-AWAY rounding to match SQL ROUND; pandas .round(0) is
        # banker's (half-to-even) and diverges on exact half-cents
        # (values are positive, so floor(x + 0.5) == half-away)
        return int(np.floor(v * 100 + 0.5).astype("int64").sum())

    return (
        table(spark, sf, "events")
        .groupBy("event_type")
        .agg(cents_sum("value").alias("cents"))
        .orderBy("event_type")
    )


@register(
    "q75_udtf_ngrams",
    oracle="""
        SELECT doc_id, CAST(i AS INT) AS pos,
               substr(text, CAST(i AS INT), 3) AS gram
        FROM documents, unnest(range(1, len(text) - 1)) AS t(i)
        WHERE doc_id < 50
        ORDER BY doc_id, pos
    """,
    doc="X5 Python user-defined TABLE function (Spark 4 @udtf): one "
    "input row -> N output rows (char 3-grams with positions), used "
    "through a SQL LATERAL join. The row-multiplying UDF shape that "
    "scalar/pandas UDFs cannot express; the engine otherwise prefers "
    "the pure-SQL explode form (q65) — this query exists to cover the "
    "UDTF API surface with an exact oracle.",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, gram string")
    class NGrams:
        def eval(self, text: str, n: int):
            if text is None:
                return
            for i in range(len(text) - n + 1):
                yield i + 1, text[i : i + n]

    spark.udtf.register("ngrams_udtf", NGrams)
    table(spark, sf, "documents").filter(
        F.col("doc_id") < 50
    ).createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.gram
        FROM _docs_udtf d, LATERAL ngrams_udtf(d.text, 3) t
        ORDER BY d.doc_id, t.pos
        """
    )
