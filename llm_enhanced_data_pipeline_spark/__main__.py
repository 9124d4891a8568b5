"""Command-line entry point — the switch-over surface for reference
users, who today drive their pipeline with `python <script>.py`:

    python -m llm_enhanced_data_pipeline_spark list [--filter SUB]
    python -m llm_enhanced_data_pipeline_spark run QUERY
        [--sf-dir DIR] [--limit N] [--explain] [--json]

`run` executes any of the 200+ registered queries (the same callables
the driver contract exposes) against a testdata directory — including
the composed pipelines (`flagship_pipeline`, `training_data_pipeline`,
`corpus_build_v2`..`v5`), every dedup/retrieval/analysis operator, and
the real-codec multimodal gates. `--explain` prints the formatted
physical plan instead of rows (the 100 TB sanity check).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="llm_enhanced_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--filter", default="", help="substring filter")

    p_run = sub.add_parser("run", help="run a registered query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true",
                       help="print the formatted physical plan instead of rows")
    p_run.add_argument("--json", action="store_true",
                       help="rows as JSON lines instead of show()")

    args = p.parse_args(argv)

    from .queries import REGISTRY

    if args.cmd == "list":
        for name, spec in sorted(REGISTRY.items()):
            if args.filter.lower() in name.lower():
                doc = (spec.doc or "").split(". ")[0][:100]
                lane = "oracle" if spec.oracle else "rows-only"
                print(f"{name:42s} [{lane}] {doc}")
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    try:
        if args.cmd == "run":
            spec = REGISTRY.get(args.query)
            if spec is None:
                close = [n for n in sorted(REGISTRY) if args.query.lower() in n.lower()]
                print(f"unknown query {args.query!r}", file=sys.stderr)
                if close:
                    print(f"did you mean: {', '.join(close[:8])}", file=sys.stderr)
                return 2
            df = spec.fn(spark, args.sf_dir)
            if args.explain:
                print(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            elif args.json:
                for row in df.limit(args.limit).collect():
                    print(json.dumps(row.asDict(recursive=True), default=str))
            else:
                df.show(args.limit, truncate=False)
            return 0
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
