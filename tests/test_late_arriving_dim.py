"""Late-arriving dimension: inferred members corrected in place
(queries/warehouse.fact_late_arriving_dim)."""

from __future__ import annotations

from datafoundation_multi_source_retail_data_integration_hub_spark.queries.warehouse import (
    fact_late_arriving_dim,
)

SF = "/root/testdata/sf0.01"


def test_inferred_members_corrected_without_renumbering(spark):
    out = fact_late_arriving_dim(spark, SF).collect()
    # non-vacuous: some members genuinely arrived late AND had facts
    assert sum(r["n_inferred_members"] for r in out) > 0
    # every placeholder was corrected: the UNKNOWN segment never surfaces
    assert all(r["segment"] != "UNKNOWN" for r in out)
    assert all(r["all_corrected"] for r in out)
    # the correction reused the placeholder surrogates (no renumbering)
    assert all(r["surrogates_stable"] for r in out)
