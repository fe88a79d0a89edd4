"""Dump .explain('formatted') plans for the r10-touched queries.

Run:  python tools/dump_r10_plans.py <suffix> [name ...]

Writes plans/r10/<query>_<suffix>.txt at sf0.1 (the bench scale), for each
named query — default: every query touched in round 10.  Includes the two
bench-path overrides (fuzzy_dedup_lsh under q29's bench label,
tpch_q10_variant under q52's) exactly as bench.py times them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from shardpack_spark.queries import load_all  # noqa: E402
from shardpack_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "q11_asof_join",
    "q16_window_rank",
    "q27_session_window",
    "q33_tfidf",
    "q34_lang_id",
    "q42_window_analytics",
    "q50_tpch_q3_shape",
    "q51_tpch_q5_shape",
    "q52_tpch_q10_shape",
    "bench_fuzzy_dedup_lsh",
    "q30b_ann_suite",
]


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__.strip())
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("dump_r10_plans")
    registry = load_all()

    from shardpack_spark.queries.llm import fuzzy_dedup_lsh
    from shardpack_spark.queries.tpch_shapes import tpch_q10_variant

    class _B:
        def __init__(self, fn):
            self.builder = staticmethod(fn)

    registry["bench_fuzzy_dedup_lsh"] = _B(fuzzy_dedup_lsh)
    registry["q52_tpch_q10_shape"] = _B(tpch_q10_variant)

    outdir = os.path.join(os.path.dirname(__file__), "..", "plans", "r10")
    os.makedirs(outdir, exist_ok=True)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = registry[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(jmode).rstrip()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan + "\n")
        print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
