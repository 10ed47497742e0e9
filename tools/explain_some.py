"""Dump .explain("formatted") for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/explain_some.py <tag> <suffix> name1 name2 ...
e.g.   python tools/explain_some.py r11 before dedup_prefix_filter sim_mmr_rerank

For streaming entries fn() replays the stream; the captured plan is the plan
of the returned (batch) DataFrame, which is what the bench times end-to-end.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqload_spark import registry
from sqload_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("sqload_explain")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(10).count()
    for name in names:
        df = registry.QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path)


if __name__ == "__main__":
    main()
