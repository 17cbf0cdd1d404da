"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is fully materialized through the noop sink (format("noop"))
so column pruning can't skip work the way .count() can.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from electricity_forecast_pipeline_airflow_k8s_spark.queries import queries as all_queries
from electricity_forecast_pipeline_airflow_k8s_spark.session import get_spark

HEADLINE = [
    "quality_profile",
    "quality_profile_approx",
    "val_grouped_stats",
    "val_outlier_rows",
    "val_gap_stats",
    "rel_pricing_summary",
    "rel_star_revenue",
    "rel_shipping_priority",
    "rel_nation_revenue",
    "rel_topk_per_group",
    "rel_rollup",
    "ts_split_counts",
    "ts_sequence_windows",
    "ts_resample_hourly",
    "ts_psi_drift",
    "ts_moving_avg_1h",
    "ts_ks_drift",
    "sess_user_sessions",
    "text_quality_score",
    "dedup_minhash_lsh_pairs",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "emb_neardup_pairs",
    "tpch_large_orders",
    # round-3 additions (dedup_keep_best/dedup_clusters excluded: their
    # iterative connected-components materializes during plan BUILD via
    # localCheckpoint, so a write-bracketed timer would underreport them)
    "ts_calendar_features",
    "ts_backtest_folds",
    "text_entropy_stats",
    "emb_centroid_assign",
    "tpch_returned_items",
]


def main() -> None:
    # lazy plans for benchmarking: see the timing note below
    os.environ["SPARK_GRAFT_SCOPED_CACHE"] = "0"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="efp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # JIT/codegen warmup: run every headline query once at the smallest sf
    # (untimed) so the timed run measures steady-state plans, not first-run
    # whole-stage-codegen compilation; fall back to the bench dir itself if
    # no sf0.001 sibling exists (custom SPARK_GRAFT_SF_DIR roots)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    # two timed iterations, report the min (steady-state; OS cache and JIT
    # noise dominates single runs at this data size). Timing brackets the
    # noop materialization of a LAZY plan: SPARK_GRAFT_SCOPED_CACHE=0 (set
    # in main) turns off the session-hygiene eager checkpoints so no query
    # computes at build time -- otherwise the checkpointing operators would
    # run OUTSIDE the timer and report near-zero.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            df = qs[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
