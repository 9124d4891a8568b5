#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from llm_enhanced_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from llm_enhanced_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("bench")
    bench_specs = sorted(
        (s for s in REGISTRY.values() if s.bench), key=lambda s: s.name
    )
    # Warm the JVM/codegen once with the cheapest query so per-query
    # numbers measure the plan, not session startup.
    warm = bench_specs[0].fn(spark, SF_DIR)
    warm.limit(1).collect()

    timings: dict[str, float] = {}
    for spec in bench_specs:
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        n = df.count()  # forces full execution; result stays distributed
        timings[spec.name] = round(time.perf_counter() - t0, 4)
        print(f"# {spec.name}: {timings[spec.name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
