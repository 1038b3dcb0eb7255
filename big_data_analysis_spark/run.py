"""CLI runner: execute any registered query by name.

    python -m big_data_analysis_spark.run tpch_q1 dedup_minhash \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain]

Prints each query's result (truncated to --limit rows) or, with
--explain, its formatted physical plan — the quickest way to eyeball
an operator without writing a script.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m big_data_analysis_spark.run", description=__doc__
    )
    ap.add_argument("queries", nargs="+", help="registered query names (see --list)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true", help="print the plan instead")
    args = ap.parse_args(argv)

    from .registry import load_all
    from .session import get_spark

    reg = load_all()
    if unknown := [q for q in args.queries if q not in reg]:
        print(f"unknown queries: {unknown}; {len(reg)} registered", file=sys.stderr)
        return 2
    spark = get_spark("bda-run")
    for name in args.queries:
        df = reg[name].fn(spark, args.sf_dir)
        print(f"== {name} ==")
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
