"""Relational-algebra semantics (SURVEY §2.2-2.7) on tiny literal data."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.query import Relation, U


@pytest.fixture(scope="module")
def rels(spark):
    a = spark.createDataFrame(
        [Row(k=1, g="x", v=10.0), Row(k=2, g="x", v=20.0), Row(k=3, g="y", v=30.0)]
    )
    b = spark.createDataFrame([Row(k=1, w="p"), Row(k=3, w="q"), Row(k=3, w="q2")])
    return Relation(a, pk=["k"]), Relation(b, pk=["k"])


def test_restrict_dict(rels):
    a, _ = rels
    assert [r.k for r in (a & {"g": "x"}).df.collect()] == [1, 2]


def test_restrict_sql_string(rels):
    a, _ = rels
    assert {r.k for r in (a & "v >= 20 AND g LIKE 'x%'").df.collect()} == {2}


def test_restrict_by_relation_is_semijoin(rels):
    a, b = rels
    # b has k=3 twice; semi-join must not duplicate a's rows
    out = (a & b).df.collect()
    assert sorted(r.k for r in out) == [1, 3]


def test_anti_restrict(rels):
    a, b = rels
    assert [r.k for r in (a - b).df.collect()] == [2]


def test_natural_join_and_left_join(rels):
    a, b = rels
    inner = a.join(b)
    assert sorted((r.k, r.w) for r in inner.df.collect()) == [(1, "p"), (3, "q"), (3, "q2")]
    left = a.join(b, left=True)
    ks = sorted(r.k for r in left.df.collect())
    assert ks == [1, 2, 3, 3]


def test_proj_keeps_pk_rename_compute_exclude(rels):
    a, _ = rels
    out = a.proj("g", doubled="v * 2")
    assert set(out.df.columns) == {"k", "g", "doubled"}
    assert {r.doubled for r in out.df.collect()} == {20.0, 40.0, 60.0}
    renamed = a.proj(key2="k")
    assert "key2" in renamed.df.columns and "v" not in renamed.df.columns
    excl = a.proj("*", "-v")
    assert set(excl.df.columns) == {"k", "g"}


def test_aggr_attaches_group_aggregates(rels):
    a, b = rels
    out = a.aggr(b, n_b="count(1)")
    rows = {r.k: r.n_b for r in out.df.collect()}
    assert rows == {1: 1, 3: 2}
    kept = a.aggr(b, n_b="count(1)", keep_all_rows=True)
    rows = {r.k: r.n_b for r in kept.df.collect()}
    assert rows[2] is None


def test_union_distinct(rels):
    a, _ = rels
    u = a + a
    assert u.df.count() == 3


def test_top(rels):
    a, _ = rels
    top1 = a.top(1, order_by="v desc")
    assert top1.df.collect()[0].k == 3


def test_restrict_by_disjoint_relation_depends_on_emptiness(spark, rels):
    a, _ = rels
    nonempty = Relation(spark.createDataFrame([Row(z=1)]))
    empty = Relation(spark.createDataFrame([Row(z=1)]).filter("z > 99"))
    assert (a & nonempty).df.count() == 3   # universal match
    assert (a & empty).df.count() == 0      # restriction by empty = empty
    assert (a - nonempty).df.count() == 0   # A − nonempty(disjoint) = empty
    assert (a - empty).df.count() == 3      # A − empty = A


def test_anti_restrict_dict_is_null_safe(spark):
    rel = Relation(spark.createDataFrame([Row(a=1, b=None), Row(a=2, b="x")]))
    out = (rel - {"a": 1}).df.collect()
    assert [r.a for r in out] == [2]  # the (1, NULL) row must be removed


def test_restrict_dict_ignores_unknown_keys(spark):
    rel = Relation(spark.createDataFrame([Row(a=1), Row(a=2)]))
    assert (rel & {"a": 1, "not_a_column": "y"}).df.count() == 1


def test_aggr_disjoint_headings_is_global_aggregate(spark, rels):
    a, _ = rels
    other = Relation(spark.createDataFrame([Row(z=10.0), Row(z=30.0)]))
    out = a.aggr(other, zmax="max(z)").df.collect()
    assert len(out) == 3 and all(r.zmax == 30.0 for r in out)


def test_union_dedupes_on_pk(spark):
    x = Relation(spark.createDataFrame([Row(k=1, v="a")]), pk=["k"])
    y = Relation(spark.createDataFrame([Row(k=1, v="b")]), pk=["k"])
    assert (x + y).df.count() == 1


def test_proj_rename_of_pk_drops_original(spark):
    rel = Relation(spark.createDataFrame([Row(k=1, v=2.0)]), pk=["k"])
    out = rel.proj("v", key2="k")
    assert set(out.df.columns) == {"key2", "v"}
    assert out.pk == ["key2"]


def test_universal_set(rels):
    a, _ = rels
    distinct_g = U("g") & a
    assert sorted(r.g for r in distinct_g.df.collect()) == ["x", "y"]
    mx = U().aggr(a, vmax="max(v)").df.collect()[0].vmax
    assert mx == 30.0
    per_g = {r.g: r.total for r in U("g").aggr(a, total="sum(v)").df.collect()}
    assert per_g == {"x": 30.0, "y": 30.0}


def test_list_restriction_or_semantics(rels):
    a, b = rels
    out = a & ["v > 25", {"g": "x"}]
    assert sorted(r.k for r in out.df.collect()) == [1, 2, 3]
    # overlap between parts must not duplicate rows
    out2 = a & ["v > 5", "v > 15"]
    assert sorted(r.k for r in out2.df.collect()) == [1, 2, 3]


def test_list_restriction_predicates_fold_to_single_filter(rels):
    """Predicate-only OR lists must stay a shuffle-free Filter (no
    union + dropDuplicates exchange)."""
    import contextlib
    import io

    a, _ = rels
    out = a & ["v > 25", {"g": "x"}]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.df.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "Union" not in p


def test_list_restriction_with_relation_part_still_unions(rels):
    a, b = rels
    out = a & [b, "v > 25"]   # semi-join part + predicate part
    assert sorted(r.k for r in out.df.collect()) == [1, 3]
