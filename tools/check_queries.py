#!/usr/bin/env python
"""Differential-check named queries against their DuckDB oracles at
one scale factor (default sf0.001). Usage:

    python tools/check_queries.py [--sf sf0.001] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="sf0.001")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    from big_data_analysis_spark.parity import compare_query, duck_connect
    from big_data_analysis_spark.registry import load_all
    from big_data_analysis_spark.session import get_spark

    spark = get_spark("check_queries")
    reg = load_all()
    con = duck_connect(sf_dir)
    bad = 0
    for name in args.queries:
        t0 = time.monotonic()
        r = compare_query(spark, con, reg[name], sf_dir)
        dt = time.monotonic() - t0
        mark = "PASS" if r.ok else "FAIL"
        bad += not r.ok
        print(
            f"{mark} {name}: {r.detail} (spark={r.spark_rows}"
            f" oracle={r.oracle_rows}) [{dt:.1f}s]",
            flush=True,
        )
        for a, b in r.mismatches[:5]:
            print(f"    spark : {a}\n    oracle: {b}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
