"""Curation relabel/merge/diff semantics + k-means IVF training."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.operators import curation as C


@pytest.fixture(scope="module")
def spikes(spark):
    rows = [Row(unit=u, harp_time=float(i)) for u in (1, 2, 3) for i in range(10)]
    return spark.createDataFrame(rows)


def test_apply_unit_mapping_merge_and_remove(spark, spikes):
    mapping = spark.createDataFrame(
        [Row(unit=2, new_unit=1), Row(unit=3, new_unit=None)],
        schema="unit bigint, new_unit bigint",
    )
    out = C.apply_unit_mapping(spikes, mapping, "cur1")
    counts = {r.unit: r.n for r in out.groupBy("unit").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 20}  # 2 merged into 1; 3 removed
    assert out.select("curation_id").distinct().collect()[0].curation_id == "cur1"


def test_unit_diff(spark, spikes):
    mapping = spark.createDataFrame(
        [Row(unit=3, new_unit=None)], schema="unit bigint, new_unit bigint"
    )
    after = C.apply_unit_mapping(spikes, mapping, "cur2")
    gone = [r.unit for r in C.unit_diff(spikes, after).collect()]
    assert gone == [3]


def test_null_unit_spikes_survive_relabel(spark, spikes):
    with_noise = spikes.unionByName(
        spark.createDataFrame([Row(unit=None, harp_time=99.0)], schema="unit bigint, harp_time double")
    )
    mapping = spark.createDataFrame([Row(unit=2, new_unit=1)], schema="unit bigint, new_unit bigint")
    out = C.apply_unit_mapping(with_noise, mapping, "cur3")
    assert out.count() == 31  # noise spike kept
    assert out.filter(F.col("unit").isNull()).count() == 1


def test_duplicate_mapping_rows_do_not_fan_out(spark, spikes):
    mapping = spark.createDataFrame(
        [Row(unit=2, new_unit=1), Row(unit=2, new_unit=1)], schema="unit bigint, new_unit bigint"
    )
    out = C.apply_unit_mapping(spikes, mapping, "cur4")
    assert out.count() == 30  # no join fan-out


def test_kmeans_validates_inputs(spark):
    from aeon_mecha_spark.datapipe.similarity import kmeans_train

    empty = spark.createDataFrame([], schema="vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        kmeans_train(empty, k=2)
    small = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0])])
    with pytest.raises(ValueError, match="only 1"):
        kmeans_train(small, k=4)


def test_curation_summary(spark, spikes):
    cur = spikes.withColumn("curation_id", F.lit("raw"))
    s = C.curation_summary(cur).collect()[0]
    assert (s.n_units, s.n_spikes) == (3, 30)


def test_kmeans_separates_planted_clusters(spark):
    from aeon_mecha_spark.datapipe.similarity import ivf_assign, kmeans_train

    rows = []
    for i in range(30):
        rows.append(Row(vec_id=i, embedding=[10.0 + (i % 3) * 0.01, 0.0]))
    for i in range(30, 60):
        rows.append(Row(vec_id=i, embedding=[-10.0 - (i % 3) * 0.01, 0.5]))
    df = spark.createDataFrame(rows)
    cents = kmeans_train(df, k=2, iters=5)
    assert len(cents) == 2
    xs = sorted(c[0] for c in cents)
    assert xs[0] < -9 and xs[1] > 9  # converged to the two planted clusters
    assigned = ivf_assign(df, cents)
    cells = assigned.groupBy("cell").count().collect()
    assert sorted(r["count"] for r in cells) == [30, 30]
