"""Unit tests for tools/oracle_order_audit.py — the standing pre-land
gate for new/changed oracles (SURVEY.md §5). Pins the r10 ADVICE fixes:
row-count diffs must report instead of crashing (StopIteration), and
the module must import regardless of the caller's cwd."""

import importlib.util
import os
import subprocess
import sys

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "oracle_order_audit.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("oracle_order_audit", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_first_diff_aligned_value_diff():
    mod = _load()
    base = ["a|1", "b|2", "c|3"]
    variant = ["a|1", "b|9", "c|3"]
    assert mod.first_diff(base, [variant]) == ("b|2", "b|9")


def test_first_diff_pure_rowcount_diff_does_not_raise():
    # identical common prefix, variant shorter: zip() finds no differing
    # pair, so the original bare next() raised StopIteration and killed
    # the audit. Now the missing row itself is the reported diff.
    mod = _load()
    base = ["a|1", "b|2", "c|3"]
    variant = ["a|1", "b|2"]
    assert mod.first_diff(base, [variant]) == ("c|3", "<missing row>")


def test_first_diff_longer_variant():
    mod = _load()
    base = ["a|1"]
    variant = ["a|1", "b|2"]
    assert mod.first_diff(base, [variant]) == ("<missing row>", "b|2")


def test_module_imports_from_foreign_cwd():
    # The explicit script-dir/repo-root sys.path entries (r10 ADVICE)
    # must make the check_correctness sibling import work even when the
    # process cwd is elsewhere.
    code = (
        "import importlib.util;"
        f"spec = importlib.util.spec_from_file_location('oa', {_TOOL!r});"
        "m = importlib.util.module_from_spec(spec);"
        "spec.loader.exec_module(m);"
        "print(callable(m.first_diff) and callable(m.main))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/tmp",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "True"


def test_unknown_query_name_fails_instead_of_passing_vacuously():
    # A typo'd query name in a pre-land gate run must exit nonzero, not
    # silently check nothing. Runs the real tool (DuckDB-only path —
    # no Spark session is started before the name check short-circuits
    # the loop, and the audit's table setup is seconds at sf0.001).
    out = subprocess.run(
        [sys.executable, _TOOL, "/root/testdata/sf0.001", "zz_not_a_query"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 1, out.stdout + out.stderr
    assert "unknown query name" in out.stdout


def test_sensitive_exit_semantics_source_contract():
    # The gate contract: nonzero exit on SENSITIVE unless --sensitive-ok.
    # Pinned at source level (running the full audit needs Spark+DuckDB
    # minutes); the flag must also be excluded from query-name parsing.
    src = open(_TOOL).read()
    assert 'if n_sensitive and "--sensitive-ok" not in sys.argv' in src
    assert 'if not a.startswith("--")' in src
