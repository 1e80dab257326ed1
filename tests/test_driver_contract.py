"""Driver-contract conformance checks — the harness constraints that
cost official evidence when violated (see git history r3/r4):

- the driver's correctness gate grades only the FIRST 50 ``queries()``
  entries, and the in-file window marker must sit exactly there;
- the driver's canonicalizer crashes on array/map output columns, so
  every gate output must be scalar-typed;
- the driver parses ONE bench JSON line and drops it past ~2 KB;
- every oracle must reference a query that exists (and vice versa for
  non-rows-only queries).
"""

from __future__ import annotations

import json

import pytest

# rows-only queries: no oracle by design (documented in queries())
ROWS_ONLY = {"q87_zarr_decode", "q93_pca_project", "q99_pq_codes", "q163_bpe_learn"}
# queries whose construction is itself expensive (driver-side training
# loops) — schema-checked less often; their outputs are pinned by tests
SKIP_SCHEMA = {"q99_pq_codes"}


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m

    return m


def test_window_marker_position(entry):
    """The '50-entry window' comment must be truthful: re-derive the
    marker position from the source and compare to the dict order."""
    names = list(entry.queries())
    assert len(names) >= 50
    src = open(entry.__file__).read()
    marker = "past the driver's 50-entry window"
    assert marker in src
    # every name BEFORE the marker line in source must be in the first
    # 50 dict entries, and the first name AFTER it must be entry 51
    before, after = src.split(marker, 1)
    in_window = [n for n in names[:50]]
    first_out = names[50]
    assert f'"{first_out}"' in after, (
        f"marker is stale: {first_out} (position 51) appears before it"
    )
    for n in in_window:
        assert f'"{n}"' in before, f"marker is stale: {n} (in-window) after it"


def test_oracle_keys_match_queries(entry):
    qs = set(entry.queries())
    oracles = set(entry.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    missing = qs - oracles - ROWS_ONLY
    assert not missing, f"queries with no oracle and not declared rows-only: {missing}"


def test_gate_outputs_are_scalar_typed(spark, entry, sf_dir):
    """No array/map/struct columns in any gate output — the driver's
    pandas canonicalizer raises 'unhashable type' on them."""
    bad = {}
    for name, fn in entry.queries().items():
        if name in SKIP_SCHEMA:
            continue
        schema = fn(spark, sf_dir).schema
        offenders = [
            f.name for f in schema.fields if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"non-scalar gate outputs: {bad}"


def test_bench_line_fits_driver_capture():
    """Estimate the printed bench JSON line at worst-case widths; the
    driver drops lines past ~2000 chars (BENCH_r03 lesson)."""
    import bench

    # bench prints short qNNN keys (full names go to BENCH_DETAIL.json)
    fake = {n.split("_", 1)[0]: 99.999 for n in bench.HEADLINE}
    assert len(fake) == len(bench.HEADLINE), "qNNN prefixes must be unique"
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": 9999.999,
            "unit": "sec",
            "queries": fake,
            "sentinel_sec": 99.999,
            "norm_total": 9999.999,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    # r13: margin widened 1900 -> 1960 to fit the five restored
    # rotation entries; still below the driver's ~2000-char capture,
    # and real values (mostly < 10 s) run ~1 char narrower per entry
    # than this worst-case estimate.
    assert len(line) < 1960, f"bench JSON line would be {len(line)} chars"
