"""Regenerate docs/PLANS.md: the physical plan of every declared query.

Run:  python tools/dump_plans.py   (writes docs/PLANS.md)

The dump uses simple mode (one line per operator) at sf0.001 so the
artifact stays reviewable; plan-SHAPE guarantees are enforced by
tests/test_plans.py and tests/test_plan_audit.py — this file exists so a
reviewer can read what actually executes without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from shardpack_spark.queries import load_all  # noqa: E402
from shardpack_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("dump_plans")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    out = [
        "# Physical plans — every declared query (generated)\n",
        "\nRegenerate with `python tools/dump_plans.py`.  Simple-mode",
        f" plans at `{SF_DIR}`; AQE may re-plan at runtime (coalesce,",
        " skew-split), which only improves these shapes.\n",
    ]
    for name, q in sorted(load_all().items()):
        df = q.builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(jmode).rstrip()
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "PLANS.md")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {os.path.normpath(path)} ({len(load_all())} plans)")


if __name__ == "__main__":
    main()
