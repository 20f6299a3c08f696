#!/usr/bin/env python
"""Capture .explain("formatted") for every headline query into plans/r15/.

Usage: python examples/capture_plans_r15.py [before|after] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipelines_spark import suite  # noqa: E402
from data_pipelines_spark.session import get_spark  # noqa: E402

HEADLINE = (
    "flood_detailed_forecast",
    "flood_summary_forecast",
    "q1_pricing_summary",
    "q3_top_orders",
    "multiway_join_revenue",
    "argmax_per_group",
    "dense_group_count",
    "semi_join_filter",
    "asof_join_purchases",
    "spatial_join_zones",
    "events_windowed_agg",
    "events_resample_fill",
    "exact_dedup_docs",
    "minhash_near_dup_pairs",
    "embedding_cosine_topk",
    "text_stats",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture-r15")
    spark.sparkContext.setLogLevel("ERROR")
    registry = suite.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exchange = plan.count("Exchange")
        joins = [
            j
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct")
            if j in plan
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "MapInArrow", "FlatMapGroupsInPandas")
            if p in plan
        ]
        print(f"{name}: Exchange={n_exchange} joins={joins} python={py}")
    spark.stop()


if __name__ == "__main__":
    main()
