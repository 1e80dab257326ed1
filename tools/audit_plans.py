"""Physical-plan audit: dump the scale-relevant lines (scans, pushed
filters, read schemas, joins, exchanges, windows) for every gate query.

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEYS = (
    "Scan parquet", "PushedFilters", "PartitionFilters", "ReadSchema",
    "Join", "Exchange", "Window", "HashAggregate", "Sort ",
)


def main() -> None:
    import __spark_entry__ as entry_mod
    from aeon_mecha_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    spark = get_spark("audit_plans")
    qs = entry_mod.queries()
    for name in (only or qs):
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            print(f"===== {name}")
            for line in buf.getvalue().splitlines():
                ls = line.strip()
                if any(k in ls for k in KEYS):
                    print("  ", ls[:200])
        except Exception as e:  # noqa: BLE001
            print(f"===== {name} ERROR {type(e).__name__}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
