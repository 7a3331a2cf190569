"""Regenerate README.md's 'NNN tests' line from the live collection.

The actual sync lives in tests/conftest.py::pytest_collection_finish,
which rewrites the count on ANY full-suite run (so the driver's
per-round `pytest tests/` keeps it honest). This wrapper just triggers
a collection without running tests:

    python tools/sync_readme_counts.py
"""

from __future__ import annotations

import os
import subprocess
import sys


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "--no-header", "-p", "no:cacheprovider"],
        cwd=root,
        stdout=subprocess.DEVNULL,
    )


if __name__ == "__main__":
    raise SystemExit(main())
