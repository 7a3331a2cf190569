"""Compute the stale-first driver-window order for plans/catalog.py.

The driver checks the first ~50 ``queries()`` entries per round. This tool
reads every CORRECTNESS_r*.json in the repo root and prints, in catalog
format, the queries whose latest signal is stale — never checked by any
round's window, or FAIL/no_oracle on their most recent check — so the next
round's ``_STALE_R*`` list in plans/catalog.py is a paste, not an audit.

    python tools/rotate_catalog.py            # print the stale list
    python tools/rotate_catalog.py --counts   # plus per-bucket counts
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def latest_status() -> dict[str, tuple[int, str]]:
    """query -> (round, status) for the most recent driver check."""
    status: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, v in data.items():
            if v.get("err") == "no_oracle":
                s = "no_oracle"
            elif v.get("hash_match"):
                s = "green"
            else:
                s = "fail"
            status[name] = (rnd, s)
    return status


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    status = latest_status()
    names = list(QUERIES)
    never = [n for n in names if n not in status]
    bad = [n for n in names if n in status and status[n][1] != "green"]

    print("# Tier 1 stale list (paste into plans/catalog.py _STALE_R<next>):")
    for n in bad:
        rnd, s = status[n]
        print(f'    "{n}",  # {s} r{rnd}')
    for n in never:
        print(f'    "{n}",  # never checked')

    # Age rotation: once nothing is FAIL/no_oracle, the window re-verifies
    # the queries whose latest green is OLDEST. Printed oldest-first so the
    # paste continues the stale list; trim to fit the ~50-query window
    # after the canary + the sections above.
    green = sorted(
        (n for n in names if status.get(n, (0, ""))[1] == "green"),
        key=lambda n: status[n][0],
    )
    print("    # oldest green signal first (age rotation)")
    for n in green:
        print(f'    "{n}",  # green r{status[n][0]}')

    if "--counts" in sys.argv:
        print(
            f"\n# {len(names)} registered: {len(green)} latest-green, "
            f"{len(bad)} latest-fail/no_oracle, {len(never)} never checked"
        )


if __name__ == "__main__":
    main()
