"""Fleet-wide physical-plan hygiene: every registered query must be
free of scale red flags — cartesian products and row-at-a-time Python
UDFs (Arrow-batched pandas stages are the sanctioned Python path).
"""

from __future__ import annotations

import pytest

from etl_pack_spark import suite

# queries whose plans legitimately contain a broadcast nested-loop
# (tiny bounded side by construction, e.g. 16 IVF centroids)
BNLJ_OK = {"ann_ivf_topk"}


@pytest.mark.parametrize("name", sorted(suite.QUERIES))
def test_no_plan_red_flags(spark, sf_dir, name):
    df = suite.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    # BatchEvalPython = row-at-a-time Python UDF; Arrow* stages are fine
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
