"""Hash-canonicalization type safety of every DuckDB oracle.

Regression guard for the q155 class of failure (the sole red row in
CORRECTNESS_r06): the engine's answer was value-correct, but the
oracle's uncast ``sum(w) OVER (...)`` came back from DuckDB as HUGEINT,
which pandas renders as float64 while Spark emits bigint — the driver's
value-hash then diverges on representation alone (``506627.0`` vs
``506627``).

This test makes that failure mode structurally impossible: for every
oracle it asks DuckDB's binder (``rel.types`` — plan-time, no
execution) for the result column types and compares their KIND against
the Spark plan's schema (also plan-time; queries that legitimately act
at build time run against sf0.001). Any column where Spark says
integral but DuckDB says HUGEINT / DOUBLE / DECIMAL (all of which land
in pandas as float64 or object), or vice versa, fails with the exact
column named.
"""

from __future__ import annotations

import os
import re

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_DTYPE_SF_DIR", "/root/testdata/sf0.001")
if not os.path.isdir(SF_DIR):  # portability: checkouts without the test dataset
    pytest.skip(f"test dataset not found at {SF_DIR}", allow_module_level=True)
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# pandas-kind buckets. HUGEINT and DECIMAL deliberately do NOT count as
# "int": duckdb.fetchdf() renders both as float64/object, which is the
# q155 bug.
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_SPARK_INT = {"byte", "short", "int", "integer", "bigint", "long"}
_SPARK_FLOAT = {"float", "double"}


def _duck_kind(t: str) -> str:
    t = str(t).upper()
    if t in _DUCK_INT:
        return "int"
    if t in _DUCK_FLOAT:
        return "float"
    if t == "HUGEINT" or t.startswith("DECIMAL"):
        return "unsafe_numeric"  # pandas: float64 (HUGEINT) / object (DECIMAL)
    if t == "BOOLEAN":
        return "bool"
    return "other"


def _spark_kind(t: str) -> str:
    t = t.lower()
    if t in _SPARK_INT:
        return "int"
    if t in _SPARK_FLOAT:
        return "float"
    if t == "boolean":
        return "bool"
    if t.startswith("decimal"):
        return "unsafe_numeric"
    return "other"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_oracle_is_hash_type_safe(spark, duck):
    import __spark_entry__ as m

    qs, oracles = m.queries(), m.oracle_sql()
    problems = []
    for name, sql in oracles.items():
        try:
            rel = duck.sql(sql)
            duck_types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # binder errors surface as their own failure
            problems.append(f"{name}: oracle does not bind: {e}")
            continue
        try:
            schema = qs[name](spark, SF_DIR).schema
        except Exception as e:
            problems.append(f"{name}: spark plan failed to build: {e}")
            continue
        spark_types = {f.name: f.dataType.simpleString() for f in schema.fields}
        if sorted(duck_types) != sorted(spark_types):
            problems.append(
                f"{name}: columns differ spark={sorted(spark_types)} oracle={sorted(duck_types)}"
            )
            continue
        for col, dt in duck_types.items():
            dk, sk = _duck_kind(dt), _spark_kind(spark_types[col])
            # the unsafe pairs: one side hashes as an integer series,
            # the other as float64/object -> guaranteed hash divergence
            bad = (
                (sk == "int" and dk in ("float", "unsafe_numeric"))
                or (sk == "float" and dk in ("int", "unsafe_numeric"))
                or (sk == "bool") != (dk == "bool")
            )
            if bad:
                problems.append(f"{name}.{col}: spark={spark_types[col]} duckdb={dt}")
    assert not problems, "hash-unsafe oracle types:\n" + "\n".join(problems)
