"""One counting convention, everywhere (VERDICT r06 'What's wrong' #3).

The registry in ``__spark_entry__.py`` is the single source of truth:
``len(queries())`` gates, of which ``len(oracle_sql())`` are
DuckDB-oracled and the rest are declared rows-only. Every document that
states a count must state THESE counts — this test parses the claims
out of README.md and docs/EXACTNESS.md so a registry change that
forgets the docs fails loudly instead of drifting.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# NO rows-only gates remain. Round 9 retired q93 trained-PCA / q99
# trained-PQ (hash-verified end-to-end by the literal-model twins
# q110/q109 + numpy training mirrors); round 10 retired q163 BPE-learn
# (training rounds unrolled as MATERIALIZED CTEs) and finally q87 zarr
# decode — its stores hold pure index arithmetic, so a literal
# ground-truth oracle (the q109/q110 pattern) hash-proves the
# twin-resolution + chunk-decode path; byte-level codec behavior stays
# pinned by test_zarr_decode.
ROWS_ONLY: set[str] = set()


def _registry():
    import __spark_entry__ as m

    return m.queries(), m.oracle_sql()


def test_registry_is_consistent():
    qs, os_ = _registry()
    assert len(qs) == len(set(qs)), "duplicate query keys collapse silently"
    missing = set(qs) - set(os_) - ROWS_ONLY
    assert not missing, f"gates with no oracle and not declared rows-only: {missing}"
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracles without a queries() entry: {orphans}"
    assert len(os_) == len(qs) - len(ROWS_ONLY)


def test_readme_counts_match_registry():
    qs, os_ = _registry()
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) driver-contract queries \((\d+) with DuckDB oracles", text)
    assert m, "README.md no longer states the gate counts"
    assert (int(m.group(1)), int(m.group(2))) == (len(qs), len(os_))
    m2 = re.search(r"# (\d+)-query oracle gate", text)
    assert m2 and int(m2.group(1)) == len(os_)


def test_exactness_doc_count_matches_registry():
    qs, os_ = _registry()
    text = open(os.path.join(REPO, "docs", "EXACTNESS.md")).read()
    m = re.search(r"\((\d+) oracle-gated queries of the (\d+)-gate registry", text)
    assert m, "docs/EXACTNESS.md no longer states the gate counts"
    assert (int(m.group(1)), int(m.group(2))) == (len(os_), len(qs))


def test_readme_suite_count_matches_collection():
    """Round-12 discipline (VERDICT r11 'What's wrong' #3): no document
    may state a test count a fresh collection contradicts. README pins
    the count; this test collects the suite and compares."""
    import subprocess

    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) pytest tests", text)
    assert m, "README.md no longer states the suite count"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    mm = re.search(r"(\d+) tests collected", out.stdout)
    assert mm, out.stdout[-500:]
    assert int(m.group(1)) == int(mm.group(1)), (
        f"README says {m.group(1)} tests, collection finds {mm.group(1)} — "
        "update the README tests/ line"
    )
