"""The Arrow-batched pandas-UDF cosine path agrees with the expression path
(same float64 math, different execution engines — §2.10 UDF surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafoundation_multi_source_retail_data_integration_hub_spark.operators.similarity import (
    cosine,
    cosine_pandas_udf,
)

from .conftest import SF_SMOKE


def test_pandas_udf_cosine_matches_expression(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]

    expr_scores = {
        r["vec_id"]: r["cos"]
        for r in emb.filter(F.col("vec_id") < 50)
        .select(
            "vec_id",
            cosine(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in qvec]),
            ).alias("cos"),
        )
        .collect()
    }
    udf_cos = cosine_pandas_udf(len(qvec))(list(map(float, qvec)))
    udf_scores = {
        r["vec_id"]: r["cos"]
        for r in emb.filter(F.col("vec_id") < 50)
        .select("vec_id", udf_cos(F.col("embedding")).alias("cos"))
        .collect()
    }
    assert set(expr_scores) == set(udf_scores)
    for k in expr_scores:
        # numpy dot reassociates; agreement to float64 roundoff is the contract
        assert udf_scores[k] == pytest.approx(expr_scores[k], rel=1e-12, abs=1e-12)
