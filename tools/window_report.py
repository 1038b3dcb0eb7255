#!/usr/bin/env python
"""Driver-window composition report (rotation hygiene helper).

Prints the ~52-query prefix the driver's CORRECTNESS harness will
grade, the never-graded oracle backlog, and any priority-tier rows
that failed to make the window — the per-round checklist for
refreshing registry.py's _DRIVER_GRADED / _GRADE_FIRST sets
(see the round memory notes: refresh from the latest
CORRECTNESS_r{N}.json at the START of each round).

Usage: python tools/window_report.py [window_size]
"""

from __future__ import annotations

import sys


def main() -> int:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 52
    from big_data_analysis_spark.registry import (
        REGISTRY,
        _DRIVER_GRADED,
        _GRADE_FIRST,
        load_all,
        ordered_registry,
    )

    load_all()
    names = list(ordered_registry())
    window = names[:size]
    ungraded = [
        s.name
        for s in REGISTRY.values()
        if s.name not in _DRIVER_GRADED and s.oracle is not None
    ]
    missing_priority = [n for n in _GRADE_FIRST if n not in window]
    print(f"registered={len(REGISTRY)} oracle-bearing="
          f"{sum(1 for s in REGISTRY.values() if s.oracle is not None)} "
          f"graded={len(_DRIVER_GRADED & set(REGISTRY))} "
          f"ungraded-oracle={len(ungraded)}")
    print(f"window[{size}]:")
    for i, n in enumerate(window):
        tag = ("PRIORITY" if n in _GRADE_FIRST else
               "graded" if n in _DRIVER_GRADED else
               "rows-only" if REGISTRY[n].oracle is None else "new")
        print(f"  {i:3d} {n:40s} {tag}")
    print(f"priority rows NOT in window: {missing_priority or 'none'}")
    after = [n for n in ungraded if n not in set(window)]
    print(f"ungraded oracle queries left after this window: {len(after)}")
    for n in after:
        print(f"  - {n}")
    return 1 if missing_priority else 0


if __name__ == "__main__":
    sys.exit(main())
