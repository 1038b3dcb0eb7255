"""Full-oracle sf0.1 sweep: every oracle-bearing registered query vs
its DuckDB twin at the bench scale factor, excluding only the
documented O(n^2)-oracle pairs queries (their DuckDB side is an
unnest cross join that takes minutes each; they are verified at
sf0.001/0.01 instead). Prints one line per failure and a final
summary line."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_ON2 = {
    "sim_threshold_pairs",
    "sim_cosine_pairs",
    "sim_knn_brute",
    "dedup_embedding",
}


def main() -> int:
    from big_data_analysis_spark.session import get_spark
    from big_data_analysis_spark.registry import load_all
    from big_data_analysis_spark.parity import compare_query, duck_connect

    sf = "/root/testdata/sf0.1"
    spark = get_spark("sweep01")
    reg = load_all()
    con = duck_connect(sf)
    names = [n for n, s in reg.items() if s.oracle and n not in SKIP_ON2]
    t0 = time.monotonic()
    fails = []
    for i, n in enumerate(sorted(names), 1):
        try:
            r = compare_query(spark, con, reg[n], sf)
            if not r.ok:
                fails.append(n)
                print(f"FAIL {n}: {r.detail[:120]}", flush=True)
        except Exception as ex:
            fails.append(n)
            print(f"ERR  {n}: {type(ex).__name__}: {str(ex)[:120]}", flush=True)
        if i % 25 == 0:
            print(f"... {i}/{len(names)} ({time.monotonic()-t0:.0f}s)", flush=True)
    print(
        f"SWEEP DONE: {len(names) - len(fails)}/{len(names)} exact at sf0.1 "
        f"in {time.monotonic()-t0:.0f}s; fails={fails}",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
