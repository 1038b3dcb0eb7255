#!/usr/bin/env python
"""Pre-flight the exact upcoming driver grading window: take the
first N slots of ordered_registry() (what the driver's CORRECTNESS
harness will grade) and run each through the same differential
comparator at the driver's correctness scale factor (sf0.01 unless
SPARK_GRAFT_SF_DIR overrides). Prints one line per query and a final
X/N summary — the per-round certification the round memory calls
"window pre-flighted 52/52".

Usage: python tools/preflight.py [window_size]
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 52
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from big_data_analysis_spark.parity import run_all
    from big_data_analysis_spark.registry import load_all, ordered_registry

    load_all()
    window = list(ordered_registry())[:size]
    bad = 0
    for r in run_all(sf_dir=sf_dir, only=window):
        mark = "PASS" if r.ok else "FAIL"
        bad += not r.ok
        print(f"{mark} {r.name}: {r.detail} "
              f"(spark={r.spark_rows} oracle={r.oracle_rows})")
        for a, b in r.mismatches:
            print(f"    spark : {a}\n    oracle: {b}")
    print(f"window preflight: {size - bad}/{size} at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
