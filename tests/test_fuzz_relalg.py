"""Randomized relational-algebra fuzz harness (round 9, VERDICT r08
item 9; grammar widened round 10 per VERDICT r09 item 6): compose
seeded random chains of the Relation API's operators (restrict /
anti-restrict / natural join / natural LEFT join / proj rename+compute
/ aggr / union / U-grouped aggregate / top — the last two mid-chain as
well as terminal, so aggregate-after-union, restrict-after-top and
second-level aggregates are reachable) over the sf0.001 TPC-H tables
PLUS the events (timestamps, JSON strings) and embeddings (array
column via engine-agnostic scalars) tables, while building the EXACT
equivalent SQL string, then hash-match the Spark result against DuckDB
running that SQL on the same parquet files.

The curated 240+ oracle gates cover each operator; this tier covers the
COMPOSITION space — the interactions (rename-then-join PK inheritance,
aggregate-after-restrict, union PK dedupe after a fan-out join,
NULL-bearing group keys downstream of a left join) that no fixed gate
enumerates. N seeds default to 200 (CI tier); set SPARK_FUZZ_SEEDS=1000
for the nightly tier. Every failure prints its seed and both plans for
replay.

Determinism rules baked into the generator (so ANY mismatch is a real
engine-parity bug, not a tie-break ambiguity):
- sums only over integer columns, CAST AS BIGINT on both sides
  (doubles pass through untouched or via min/max — never re-summed);
- `top` orders by the chain's full primary key (unique by
  construction: base PKs are unique and every generated join is
  many-to-one onto a renamed dimension PK);
- unions are restrictions of the SAME upstream chain, so PK-distinct
  (Relation.+) and full-row DISTINCT (SQL UNION) agree.
"""

from __future__ import annotations

import datetime
import os
import random
from decimal import Decimal

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
N_SEEDS = int(os.environ.get("SPARK_FUZZ_SEEDS", "200"))

# column kinds drive literal/aggregate choices: i=int, f=float, s=str,
# t=timestamp
SCHEMAS = {
    "region": {"pk": ["r_regionkey"], "cols": {"r_regionkey": "i", "r_name": "s"}},
    "nation": {
        "pk": ["n_nationkey"],
        "cols": {"n_nationkey": "i", "n_name": "s", "n_regionkey": "i"},
    },
    "customer": {
        "pk": ["c_custkey"],
        "cols": {
            "c_custkey": "i",
            "c_name": "s",
            "c_nationkey": "i",
            "c_acctbal": "f",
            "c_mktsegment": "s",
        },
    },
    "supplier": {
        "pk": ["s_suppkey"],
        "cols": {
            "s_suppkey": "i",
            "s_name": "s",
            "s_nationkey": "i",
            "s_acctbal": "f",
        },
    },
    "part": {
        "pk": ["p_partkey"],
        "cols": {
            "p_partkey": "i",
            "p_name": "s",
            "p_brand": "s",
            "p_type": "s",
            "p_size": "i",
            "p_retailprice": "f",
        },
    },
    "orders": {
        "pk": ["o_orderkey"],
        "cols": {
            "o_orderkey": "i",
            "o_custkey": "i",
            "o_orderstatus": "s",
            "o_totalprice": "f",
            "o_orderdate": "t",
            "o_orderpriority": "s",
        },
    },
    # text-heavy table: exercises string predicates/computes on a
    # column with real unicode content (no curated literal pool)
    "documents": {
        "pk": ["doc_id"],
        "cols": {
            "doc_id": "i",
            "text": "s",
            "lang": "s",
            "source": "s",
            "n_chars": "i",
        },
    },
    # event stream (round 10): timestamp predicates on 2024 data + a
    # JSON-string column through the generic string ops
    "events": {
        "pk": ["event_id"],
        "cols": {
            "event_id": "i",
            "ts": "t",
            "user_id": "i",
            "event_type": "s",
            "value": "f",
            "props": "s",
        },
    },
    # embedding table (round 10): the array column enters through
    # engine-agnostic scalars (len → emb_dim, first element → e0) so
    # list-literal formatting differences can't fake a mismatch
    "embeddings": {
        "pk": ["vec_id"],
        "cols": {"vec_id": "i", "label": "i", "emb_dim": "i", "e0": "f"},
    },
}

# tables whose base relation needs a projection (Spark side built with
# DataFrame functions, SQL side its DuckDB equivalent — later generated
# ops stay engine-agnostic strings)
BASE_SQL = {
    "embeddings": (
        "SELECT vec_id, label, len(embedding) AS emb_dim, "
        "embedding[1] AS e0 FROM embeddings"
    ),
}

# literal pools per string column (sampled for =, <>, LIKE prefixes)
STR_LITS = {
    "r_name": ["REGION_0", "REGION_3"],
    "n_name": ["NATION_3", "NATION_17"],
    "c_name": ["Customer#000000007"],
    "c_mktsegment": ["BUILDING", "MACHINERY", "FURNITURE"],
    "s_name": ["Supplier#000000003"],
    "p_name": ["cold widget", "small bolt"],
    "p_brand": ["Brand#13", "Brand#5"],
    "p_type": ["ECONOMY", "PROMO", "STANDARD"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "5-LOW", "3-MEDIUM"],
    "lang": ["en", "de", "zh", "es"],
    "source": ["src0", "src1", "src2"],
    "event_type": ["purchase", "signup", "click", "error", "view"],
}
LIKE_PREFIX = {
    "r_name": "REGION_",
    "n_name": "NATION_1",
    "c_name": "Customer#00000001",
    "s_name": "Supplier#",
    "p_name": "small",
    "p_brand": "Brand#1",
    "p_type": "P",
    "c_mktsegment": "M",
    "o_orderstatus": "F",
    "o_orderpriority": "3",
    "lang": "e",
    "source": "src",
    "text": "the",
    "event_type": "s",
    "props": '{"k": 1',
}
INT_RANGES = {
    "r_regionkey": (0, 4),
    "n_nationkey": (0, 24),
    "n_regionkey": (0, 4),
    "c_custkey": (0, 149),
    "c_nationkey": (0, 24),
    "s_suppkey": (0, 9),
    "s_nationkey": (0, 24),
    "p_partkey": (0, 199),
    "p_size": (1, 50),
    "o_orderkey": (0, 1499),
    "o_custkey": (0, 149),
    "doc_id": (0, 4999),
    "n_chars": (1, 900),
    "event_id": (0, 999),
    "user_id": (0, 14),
    "vec_id": (0, 499),
    "label": (0, 9),
    "emb_dim": (60, 68),
}
FLOAT_RANGES = {
    "c_acctbal": (0.0, 10000.0),
    "s_acctbal": (0.0, 10000.0),
    "p_retailprice": (100.0, 2000.0),
    "o_totalprice": (1000.0, 400000.0),
    "value": (0.0, 330.0),
    "e0": (-0.4, 0.4),
}

# per-column year pools for timestamp predicates (events data is 2024)
TS_YEARS = {"ts": (2024, 2024)}

# many-to-one join edges: fact FK column -> (dim table, dim PK to rename)
EDGES = {
    "nation": [("n_regionkey", "region", "r_regionkey")],
    "customer": [("c_nationkey", "nation", "n_nationkey")],
    "supplier": [("s_nationkey", "nation", "n_nationkey")],
    "orders": [("o_custkey", "customer", "c_custkey")],
    "events": [("user_id", "customer", "c_custkey")],
}


class Chain:
    """Parallel Spark-Relation / SQL-string construction state."""

    def __init__(self, rel, sql, cols, pk, joined):
        self.rel = rel
        self.sql = sql
        self.cols = dict(cols)  # name -> kind
        self.pk = list(pk)
        self.joined = set(joined)


@pytest.fixture(scope="module")
def tables(spark):
    from pyspark.sql import functions as F
    from aeon_mecha_spark.query.relation import Relation

    out = {}
    for t, meta in SCHEMAS.items():
        df = spark.read.parquet(f"{SF}/{t}.parquet")
        if t == "embeddings":  # Spark twin of BASE_SQL['embeddings']
            df = df.select(
                "vec_id",
                "label",
                F.size("embedding").alias("emb_dim"),
                F.element_at("embedding", 1).alias("e0"),
            )
        out[t] = (Relation(df, meta["pk"]), meta)
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in SCHEMAS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _pred(rng: random.Random, cols: dict) -> str | None:
    """One SQL predicate string valid verbatim in Spark AND DuckDB."""
    cands = [c for c, k in cols.items() if k in "ifst" and not c.startswith("fz_")]
    if not cands:
        return None
    c = rng.choice(cands)
    k = cols[c]
    if k == "i":
        lo, hi = INT_RANGES.get(c, (0, 100))
        v = rng.randint(lo, hi)
        return rng.choice(
            [f"{c} >= {v}", f"{c} < {v}", f"{c} % {rng.randint(2, 7)} = 0"]
        )
    if k == "f":
        lo, hi = FLOAT_RANGES.get(c, (0.0, 1000.0))
        v = round(rng.uniform(lo, hi), 2)
        return rng.choice([f"{c} >= {v}", f"{c} < {v}"])
    if k == "s":
        if c in STR_LITS and rng.random() < 0.7:
            v = rng.choice(STR_LITS[c])
            return rng.choice([f"{c} = '{v}'", f"{c} <> '{v}'"])
        return f"{c} LIKE '{LIKE_PREFIX.get(c, 'X')}%'"
    if k == "t":
        y = rng.randint(*TS_YEARS.get(c, (1995, 2001)))
        m = rng.randint(1, 12)
        return rng.choice([f"{c} >= ", f"{c} < "]) + f"TIMESTAMP '{y}-{m:02d}-01'"
    return None


def _agg_specs(rng: random.Random, cols: dict, n: int) -> dict[str, str]:
    """Aggregate spec strings valid in both engines (no raw SUM(double))."""
    out = {"fz_cnt": "CAST(COUNT(*) AS BIGINT)"}
    cands = [c for c, k in cols.items() if k in "ifs" and not c.startswith("fz_")]
    rng.shuffle(cands)
    for i, c in enumerate(cands[: n - 1]):
        k = cols[c]
        if k == "i" and rng.random() < 0.5:
            out[f"fz_a{i}"] = f"CAST(SUM({c}) AS BIGINT)"
        else:
            out[f"fz_a{i}"] = rng.choice([f"MIN({c})", f"MAX({c})"])
    return out


def _apply_op(rng: random.Random, ch: Chain, tables, op: str) -> Chain:
    from aeon_mecha_spark.query.relation import Relation, U

    if op in ("restrict", "anti"):
        p = _pred(rng, ch.cols)
        if p is None:
            return ch
        if op == "restrict":
            return Chain(
                ch.rel & p, f"SELECT * FROM ({ch.sql}) WHERE {p}",
                ch.cols, ch.pk, ch.joined,
            )
        return Chain(
            ch.rel - p, f"SELECT * FROM ({ch.sql}) WHERE NOT ({p})",
            ch.cols, ch.pk, ch.joined,
        )

    if op in ("join", "aggr"):
        edges = [
            (fk, dim, dimpk)
            for fk, dim, dimpk in ch.edges_avail
            if fk in ch.cols and dim not in ch.joined
        ]
        if not edges:
            return ch
        fk, dim, dimpk = rng.choice(edges)
        dim_rel, dim_meta = tables[dim]
        if op == "join":
            # rename the dim PK to the fact FK, drop any column name
            # already present upstream (so the natural join key set is
            # exactly {fk}), then natural-join
            keep = [
                c for c in dim_meta["cols"]
                if c != dimpk and c not in ch.cols
            ]
            renamed = dim_rel.proj(*keep, **{fk: dimpk})
            sql_dim = ", ".join([f"{dimpk} AS {fk}"] + keep)
            new_cols = dict(ch.cols)
            for c in keep:
                new_cols[c] = dim_meta["cols"][c]
            joined = ch.rel * renamed
            sql = (
                f"SELECT * FROM ({ch.sql}) "
                f"JOIN (SELECT {sql_dim} FROM {dim}) USING ({fk})"
            )
            pk = list(dict.fromkeys([*ch.pk, fk]))
            return Chain(joined, sql, new_cols, pk, ch.joined | {dim})
        # aggr: group the dim's parent FACT? DataJoint aggr attaches
        # aggregates of the MANY side; here the chain is the many side,
        # so aggregate the chain per dim key instead via U — covered by
        # the "uagg" op. For aggr, attach dim aggregates per fk (the
        # dim is unique per key, so MIN == the value: still exercises
        # the groupBy+join path).
        name = f"fz_dn{len(ch.cols)}"
        if name in ch.cols:
            return ch
        specs = {name: "CAST(COUNT(*) AS BIGINT)"}
        renamed = dim_rel.proj(**{fk: dimpk})
        out = ch.rel.aggr(renamed, **specs)
        inner = f"SELECT {dimpk} AS {fk} FROM {dim}"
        sql = (
            f"SELECT * FROM ({ch.sql}) JOIN "
            f"(SELECT {fk}, CAST(COUNT(*) AS BIGINT) AS {name} "
            f"FROM ({inner}) GROUP BY {fk}) USING ({fk})"
        )
        new_cols = dict(ch.cols)
        new_cols[name] = "i"
        return Chain(out, sql, new_cols, ch.pk, ch.joined)

    if op == "join_left":
        # natural LEFT join (Relation.join(left=True)) onto a RESTRICTED
        # renamed dim — the restriction guarantees unmatched fact rows,
        # so NULL dim columns flow through later predicates/aggregates
        edges = [
            (fk, dim, dimpk)
            for fk, dim, dimpk in ch.edges_avail
            if fk in ch.cols and dim not in ch.joined
        ]
        if not edges:
            return ch
        fk, dim, dimpk = rng.choice(edges)
        dim_rel, dim_meta = tables[dim]
        keep = [c for c in dim_meta["cols"] if c != dimpk and c not in ch.cols]
        if not keep:
            return ch
        m = rng.randint(2, 4)
        renamed = dim_rel.proj(*keep, **{fk: dimpk}) & f"{fk} % {m} = 0"
        out = ch.rel.join(renamed, left=True)
        sql_dim = ", ".join([f"{dimpk} AS {fk}"] + keep)
        sql = (
            f"SELECT * FROM ({ch.sql}) LEFT JOIN "
            f"(SELECT {sql_dim} FROM {dim} WHERE {dimpk} % {m} = 0) "
            f"USING ({fk})"
        )
        new_cols = dict(ch.cols)
        for c in keep:
            new_cols[c] = dim_meta["cols"][c]
        pk = list(dict.fromkeys([*ch.pk, fk]))
        return Chain(out, sql, new_cols, pk, ch.joined | {dim})

    if op in ("semi", "antij"):
        # restrict/anti-restrict by a RELATION operand: the dim PK is
        # renamed to the fact FK so the shared-column set is exactly
        # {fk}; Relation semi/anti-joins on it (dropDuplicates first)
        edges = [
            (fk, dim, dimpk)
            for fk, dim, dimpk in ch.edges_avail
            if fk in ch.cols
        ]
        if not edges:
            return ch
        fk, dim, dimpk = rng.choice(edges)
        dim_rel, _ = tables[dim]
        m = rng.randint(2, 5)
        sub = dim_rel.proj(**{fk: dimpk}) & f"{fk} % {m} = 0"
        inner = (
            f"SELECT DISTINCT {dimpk} AS {fk} FROM {dim} "
            f"WHERE {dimpk} % {m} = 0"
        )
        if op == "semi":
            out = ch.rel & sub
            kw = "SEMI"
        else:
            out = ch.rel - sub
            kw = "ANTI"
        sql = f"SELECT * FROM ({ch.sql}) {kw} JOIN ({inner}) USING ({fk})"
        return Chain(out, sql, ch.cols, ch.pk, ch.joined)

    if op == "aggr_left":
        # aggr(..., keep_all_rows=True) over a RESTRICTED dim: unmatched
        # fact rows keep NULL aggregates — the left-join branch
        edges = [
            (fk, dim, dimpk)
            for fk, dim, dimpk in ch.edges_avail
            if fk in ch.cols
        ]
        if not edges:
            return ch
        fk, dim, dimpk = rng.choice(edges)
        dim_rel, _ = tables[dim]
        name = f"fz_ln{len(ch.cols)}"
        if name in ch.cols:
            return ch
        m = rng.randint(2, 4)
        sub = dim_rel.proj(**{fk: dimpk}) & f"{fk} % {m} = 1"
        out = ch.rel.aggr(
            sub, keep_all_rows=True, **{name: "CAST(COUNT(*) AS BIGINT)"}
        )
        inner = f"SELECT {dimpk} AS {fk} FROM {dim} WHERE {dimpk} % {m} = 1"
        sql = (
            f"SELECT * FROM ({ch.sql}) LEFT JOIN "
            f"(SELECT {fk}, CAST(COUNT(*) AS BIGINT) AS {name} "
            f"FROM ({inner}) GROUP BY {fk}) USING ({fk})"
        )
        cols = dict(ch.cols)
        cols[name] = "i"
        return Chain(out, sql, cols, ch.pk, ch.joined)

    if op == "udistinct":
        from aeon_mecha_spark.query.relation import U as _U

        cands = [c for c, k in ch.cols.items() if k in "is"]
        if not cands:
            return ch
        attrs = rng.sample(cands, k=min(len(cands), rng.randint(1, 3)))
        out = _U(*attrs) & ch.rel
        sql = f"SELECT DISTINCT {', '.join(attrs)} FROM ({ch.sql})"
        cols = {a: ch.cols[a] for a in attrs}
        return Chain(out, sql, cols, attrs, ch.joined)

    if op == "proj_subset":
        non_pk = [c for c in ch.cols if c not in ch.pk]
        if len(non_pk) < 2:
            return ch
        keep = rng.sample(non_pk, k=rng.randint(1, len(non_pk) - 1))
        out = ch.rel.proj(*keep)
        cols = {c: ch.cols[c] for c in [*ch.pk, *keep]}
        sel = ", ".join(dict.fromkeys([*ch.pk, *keep]))
        return Chain(
            out, f"SELECT {sel} FROM ({ch.sql})", cols, ch.pk, ch.joined
        )

    if op == "proj_compute":
        cands = [c for c, k in ch.cols.items() if k in "is"]
        if not cands:
            return ch
        c = rng.choice(cands)
        if ch.cols[c] == "i":
            expr = rng.choice([f"{c} + 7", f"{c} % 5", f"{c} * 3"])
        else:
            expr = rng.choice([f"length({c})", f"upper({c})"])
        name = f"fz_x{len(ch.cols)}"
        out = ch.rel.proj("*", **{name: expr})
        cols = dict(ch.cols)
        cols[name] = "i" if ch.cols[c] == "i" or "length" in expr else "s"
        return Chain(
            out, f"SELECT *, {expr} AS {name} FROM ({ch.sql})",
            cols, ch.pk, ch.joined,
        )

    if op == "union":
        p1, p2 = _pred(rng, ch.cols), _pred(rng, ch.cols)
        if not p1 or not p2:
            return ch
        out = (ch.rel & p1) + (ch.rel & p2)
        sql = (
            f"SELECT * FROM ({ch.sql}) WHERE {p1} "
            f"UNION SELECT * FROM ({ch.sql}) WHERE {p2}"
        )
        return Chain(out, sql, ch.cols, ch.pk, ch.joined)

    if op == "uagg":
        group_cands = [
            c for c, k in ch.cols.items() if k in "is" and c not in ch.pk
        ]
        if not group_cands:
            return ch
        keys = rng.sample(group_cands, k=min(len(group_cands), rng.randint(1, 2)))
        # suffix output names with the (strictly growing) SQL length so
        # a SECOND uagg in the chain (mid-chain op since round 10) can't
        # re-mint a name that survives as one of its own group keys
        specs = {
            f"{name}_{len(ch.sql)}": spec
            for name, spec in _agg_specs(rng, ch.cols, rng.randint(1, 3)).items()
        }
        out = U(*keys).aggr(ch.rel, **specs)
        sel = ", ".join(
            keys + [f"{spec} AS {name}" for name, spec in specs.items()]
        )
        sql = f"SELECT {sel} FROM ({ch.sql}) GROUP BY {', '.join(keys)}"
        cols = {k: ch.cols[k] for k in keys}
        for name, spec in specs.items():
            src = spec.split("(")[-1].rstrip(") ").split(")")[0]
            cols[name] = (
                "i" if "COUNT" in spec or "SUM" in spec else ch.cols.get(src, "i")
            )
        return Chain(out, sql, cols, keys, ch.joined)

    if op == "top":
        n = rng.randint(1, 20)
        off = rng.choice([0, 0, 3])
        order = list(ch.pk)
        if not order:
            return ch
        out = ch.rel.top(n, order_by=order, offset=off)
        # Spark's asc() sorts NULLS FIRST, DuckDB's default is NULLS
        # LAST — pin the Spark convention in the oracle SQL (group keys
        # can be NULL once uagg follows a left join, round 10)
        ob = ", ".join(f"{c} NULLS FIRST" for c in order)
        sql = (
            f"SELECT * FROM ({ch.sql}) ORDER BY {ob} "
            f"LIMIT {n}" + (f" OFFSET {off}" if off else "")
        )
        return Chain(out, sql, ch.cols, ch.pk, ch.joined)

    return ch


def _build(rng: random.Random, tables) -> Chain:
    t = rng.choice(list(SCHEMAS))
    rel, meta = tables[t]
    ch = Chain(rel, BASE_SQL.get(t, f"SELECT * FROM {t}"), meta["cols"], meta["pk"], {t})
    ch.edges_avail = EDGES.get(t, [])
    # round 10: uagg and top are MID-CHAIN ops too — aggregate-after-
    # union, restrict-after-top, join-after-aggregate etc. all reachable
    # (uagg/top stay rarer than the rest so chains keep some depth)
    ops = [
        "restrict", "anti", "join", "join_left", "aggr", "proj_subset",
        "proj_compute", "union", "semi", "antij", "aggr_left",
        "restrict", "join", "uagg", "top",
    ]
    for _ in range(rng.randint(2, 5)):
        nxt = _apply_op(rng, ch, tables, rng.choice(ops))
        nxt.edges_avail = ch.edges_avail
        ch = nxt
    # optional terminal op
    term = rng.random()
    if term < 0.30:
        nxt = _apply_op(rng, ch, tables, "uagg")
        nxt.edges_avail = ch.edges_avail
        ch = nxt
    elif term < 0.45:
        nxt = _apply_op(rng, ch, tables, "top")
        nxt.edges_avail = ch.edges_avail
        ch = nxt
    elif term < 0.60:
        nxt = _apply_op(rng, ch, tables, "udistinct")
        nxt.edges_avail = ch.edges_avail
        ch = nxt
    return ch


def _norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return "\x00NULL" if v is None else str(v)


def _spark_rows(rel):
    cols = sorted(rel.df.columns)
    return sorted(
        tuple(_norm_cell(r[c]) for c in cols) for r in rel.df.collect()
    ), cols


def _duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = sorted(
        tuple(_norm_cell(row[i]) for i in order) for row in cur.fetchall()
    )
    return rows, sorted(names)


def test_fuzz_relalg_matches_duckdb(spark, tables, duck):
    failures = []
    for seed in range(N_SEEDS):
        rng = random.Random(1_000_003 * (seed + 1))
        try:
            ch = _build(rng, tables)
            s_rows, s_cols = _spark_rows(ch.rel)
            d_rows, d_cols = _duck_rows(duck, ch.sql)
        except Exception as e:  # noqa: BLE001 - report the seed
            sql = getattr(locals().get("ch"), "sql", "<build failed>")
            failures.append((seed, sql, f"EXEC {type(e).__name__}: {str(e)[:400]}"))
            continue
        if s_cols != d_cols:
            failures.append((seed, ch.sql, f"cols {s_cols} != {d_cols}"))
        elif s_rows != d_rows:
            diff = next(
                (i, a, b)
                for i, (a, b) in enumerate(
                    zip(s_rows + [None] * len(d_rows), d_rows + [None] * len(s_rows))
                )
                if a != b
            )
            failures.append(
                (seed, ch.sql, f"{len(s_rows)} vs {len(d_rows)} rows; first diff {diff}")
            )
        if len(failures) >= 3:
            break
    assert not failures, "\n\n".join(
        f"seed {s}:\n{sql}\n{msg}" for s, sql, msg in failures
    )
