"""Pure-SQL ML inference: a linear model scored inside the engine.

PAPERS.md's retrieved corpus includes "Machine Learning Inference
Pipeline Execution Using Pure SQL Based on Operator Fusion"
(ICDE 2025); the pattern matters at 100 TB because shipping features
to a model service inverts the data-gravity equation — scoring
batches inside the scan (model weights as plan literals, fused into
whole-stage codegen) is free compared to any RPC path.

The model here is a fixed-coefficient linear classifier over the
embedding vector (weights from a seeded generator — model state as
literals, exactly like the LSH hyperplanes in operators/similarity.py).
The logit stays DECIMAL end-to-end (order-free exact fold; one cast
to double after the final SUM), the predicted class is its sign, and the
output aggregates a per-label confusion summary against the parity of
the stored label — so the whole inference pipeline, not just the dot
product, is value-checked.  No libm: the monotone logit replaces
sigmoid (same argmax/thresholding, no exp())."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_vs_dbt_spark.catalog import load_table

EMBED_DIM = 64
BIAS = 0.05
DLOGIT = "DECIMAL(28,12)"


def _weights() -> list[float]:
    """Seeded deterministic weights — the 'trained model' literal."""
    import numpy as np

    rng = np.random.RandomState(7)
    return [round(float(w), 6) for w in rng.randn(EMBED_DIM) * 0.1]


def _logit_expr(dialect: str) -> str:
    w = _weights()
    if dialect == "spark":
        arr = "array(" + ", ".join(f"{c!r}D" for c in w) + ")"
        return (
            f"aggregate(zip_with(embedding, {arr}, "
            f"(x, y) -> CAST(CAST(x AS DOUBLE) * y AS {DLOGIT})), "
            f"CAST({BIAS!r} AS {DLOGIT}), (acc, t) -> CAST(acc + t AS {DLOGIT}))"
        )
    arr = "[" + ", ".join(repr(c) for c in w) + "]"
    # decimal addition is exact and associative, so the stepwise fold
    # equals bias + list_sum of the per-term decimals (list_reduce
    # avoided: DuckDB 1.0.0 misattributes grouped lambda results at
    # some vector-chunk shapes — r6 cross-scale sweep finding)
    return (
        f"CAST(CAST({BIAS!r} AS {DLOGIT}) + "
        f"list_sum(list_transform(list_zip(embedding::DOUBLE[], "
        f"{arr}::DOUBLE[]), t -> CAST(t[1] * t[2] AS {DLOGIT}))) "
        f"AS {DLOGIT})"
    )


def _sql(dialect: str) -> str:
    return f"""
WITH scored AS (
  SELECT vec_id, label, {_logit_expr(dialect)} AS logit
  FROM embeddings)
SELECT label,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN logit > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_pos,
       CAST(SUM(CASE WHEN (logit > 0) = (label % 2 = 1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_agree_parity,
       CAST(SUM(logit) AS DOUBLE) AS sum_logit
FROM scored GROUP BY label ORDER BY label
"""


def q_ml_inference_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every embedding with the literal linear model; per-label
    prediction census (see module doc)."""
    from clickhouse_vs_dbt_spark.catalog import register_views

    register_views(spark, sf_dir, ("embeddings",))
    return spark.sql(_sql("spark"))


QUERIES = {"ml_inference_sql": q_ml_inference_sql}
ORACLES = {"ml_inference_sql": _sql("duckdb")}
