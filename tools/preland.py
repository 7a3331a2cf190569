"""One-command pre-land gate for new or changed catalog queries/oracles.

Mechanizes the standing rule (SURVEY.md §5): before a query or oracle
change lands, it must pass BOTH

  1. the Spark-vs-DuckDB correctness gate (tools/check_correctness.py)
     at sf0.001 AND sf0.01, and
  2. the four-leg input-order-sensitivity audit
     (tools/oracle_order_audit.py) at sf0.01

for every named query. Exit 0 only if every leg is green:

    python tools/preland.py graph_triangle_count [more queries ...]

Add ``--sf01`` to extend both checks to sf0.1 (slower; required when the
change is specifically about large-SF behavior, e.g. rounding seams or
planner hints).
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)


def _run(label: str, args: list[str]) -> bool:
    print(f"==> {label}: {' '.join(args)}", flush=True)
    r = subprocess.run([sys.executable] + args, cwd=_ROOT)
    ok = r.returncode == 0
    print(f"<== {label}: {'OK' if ok else f'FAILED (exit {r.returncode})'}\n", flush=True)
    return ok


def main() -> int:
    queries = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not queries:
        print(__doc__)
        return 2
    sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    audit_sfs = ["/root/testdata/sf0.01"]
    if "--sf01" in sys.argv:
        sfs.append("/root/testdata/sf0.1")
        audit_sfs.append("/root/testdata/sf0.1")

    ok = True
    for sf in sfs:
        ok &= _run(
            f"correctness gate @ {os.path.basename(sf)}",
            [os.path.join(_HERE, "check_correctness.py"), sf] + queries,
        )
    for sf in audit_sfs:
        ok &= _run(
            f"order audit @ {os.path.basename(sf)}",
            [os.path.join(_HERE, "oracle_order_audit.py"), sf] + queries,
        )
    print("PRELAND: " + ("ALL GREEN — safe to land" if ok else "RED — do not land"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
