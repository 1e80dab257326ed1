"""DataJoint-semantics relational algebra over Spark DataFrames.

The reference's query surface is DataJoint's operator algebra — lazy
``QueryExpression`` objects composed with ``&`` (restrict), ``-``
(anti-restrict), ``*`` (natural join), ``.join(left=True)``, ``.proj()``,
``.aggr()``, ``+`` (union), ``dj.U()`` (universal set) and ``dj.Top``
(SURVEY.md §2.2-2.7; e.g. /root/reference/aeon/dj_pipeline/
spike_sorting.py:1268-1299). DataJoint compiles that algebra to one SQL
statement executed by MySQL; here each operator composes a *lazy Spark
DataFrame plan* and Catalyst does the optimizing — predicate pushdown,
column pruning, join reordering and broadcast selection come for free.

Scale notes (100 TB):
- restrictions stay as Catalyst ``filter`` nodes → pushed to Parquet
  row-group/partition pruning, never materialized in Python;
- semi/anti restriction by another relation compiles to
  ``left_semi``/``left_anti`` joins, which AQE converts to broadcast
  when the restricting side is small (the common case: restricting a
  stream table by an experiment/config dim);
- natural join broadcasts the smaller side automatically under the
  64 MB threshold set in session.py.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RestrictionLike = Union[Mapping, str, Column, "Relation", list, tuple]


def _shared_cols(a: DataFrame, b: DataFrame) -> list[str]:
    bcols = set(b.columns)
    return [c for c in a.columns if c in bcols]


class Relation:
    """A lazy relation = Spark DataFrame + primary-key column list.

    The PK drives DataJoint semantics: ``proj()`` always keeps the PK,
    ``aggr()`` groups by it, joins are natural (on shared columns, which
    in DataJoint are FK-inherited PK columns).
    """

    def __init__(self, df: DataFrame, pk: Iterable[str] = ()):  # noqa: D107
        self.df = df
        self.pk = [c for c in pk if c in df.columns]

    # -- construction helpers ------------------------------------------------

    def _with(self, df: DataFrame, pk: Iterable[str] | None = None) -> "Relation":
        return Relation(df, self.pk if pk is None else pk)

    # -- restriction (&) and anti-restriction (-) ----------------------------
    # DataJoint: dict → equality AND; str → verbatim SQL predicate;
    # relation → semi-join on shared attributes; list/tuple → OR of parts.
    # Refs: dict/str usage acquisition.py:645-654, ephys.py:625-627;
    # subquery restriction ephys_utils.py:625; anti load_metadata.py:762.

    def _dict_pred(self, cond: Mapping) -> Column | None:
        """Null-safe equality AND over the dict; keys not in the heading
        are ignored (DataJoint dict-restriction semantics)."""
        pred = None
        cols = set(self.df.columns)
        for k, v in cond.items():
            if k not in cols:
                continue
            c = F.col(k).eqNullSafe(F.lit(v))
            pred = c if pred is None else (pred & c)
        return pred

    def restrict(self, cond: RestrictionLike) -> "Relation":
        if isinstance(cond, Relation):
            on = _shared_cols(self.df, cond.df)
            if not on:
                # no shared attrs: DJ semantics = keep all iff the other
                # relation is non-empty — expressed lazily as a semi-join
                # on a constant-true condition against its first row
                probe = cond.df.limit(1)
                return self._with(self.df.join(probe, F.lit(True), "left_semi"))
            return self._with(self.df.join(cond.df.select(*on).dropDuplicates(), on, "left_semi"))
        if isinstance(cond, Mapping):
            pred = self._dict_pred(cond)
            if pred is None:
                return self
            return self._with(self.df.filter(pred))
        if isinstance(cond, (list, tuple)):
            if not cond:
                return self  # empty OR-list restricts to nothing in DJ; keep-all is safer here
            # predicate-only lists (str/Column/dict) fold into ONE OR
            # filter — no union, no dropDuplicates shuffle, and the
            # disjunction can still push down to the scan
            preds: list[Column] = []
            for c in cond:
                if isinstance(c, str):
                    preds.append(F.expr(c))
                elif isinstance(c, Column):
                    preds.append(c)
                elif isinstance(c, Mapping):
                    p = self._dict_pred(c)
                    # empty/unmatched dict = keep-all part -> whole OR keeps all
                    preds.append(F.lit(True) if p is None else p)
                else:
                    preds = []
                    break
            if preds:
                pred = preds[0]
                for p in preds[1:]:
                    pred = pred | p
                return self._with(self.df.filter(pred))
            # relation parts need semi-join semantics: union + PK dedupe
            parts = [self.restrict(c).df for c in cond]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return self._with(out.dropDuplicates())
        if isinstance(cond, str):
            return self._with(self.df.filter(F.expr(cond)))
        if isinstance(cond, Column):
            return self._with(self.df.filter(cond))
        raise TypeError(f"unsupported restriction type: {type(cond)}")

    def anti_restrict(self, cond: RestrictionLike) -> "Relation":
        if isinstance(cond, Relation):
            on = _shared_cols(self.df, cond.df)
            if not on:
                # A − other = A iff other is empty, else ∅ — lazy form
                probe = cond.df.limit(1)
                return self._with(self.df.join(probe, F.lit(True), "left_anti"))
            return self._with(self.df.join(cond.df.select(*on).dropDuplicates(), on, "left_anti"))
        # negate predicate forms (null-safe: rows matching the predicate
        # are removed even when they contain NULLs elsewhere)
        if isinstance(cond, Mapping):
            pred = self._dict_pred(cond)
            if pred is None:
                return self._with(self.df.limit(0))  # A − A = ∅
            return self._with(self.df.filter(~pred))
        if isinstance(cond, str):
            return self._with(self.df.filter(~F.expr(cond)))
        if isinstance(cond, Column):
            return self._with(self.df.filter(~cond))
        raise TypeError(f"unsupported anti-restriction type: {type(cond)}")

    __and__ = restrict
    __sub__ = anti_restrict

    # -- joins ---------------------------------------------------------------

    def join(self, other: "Relation", left: bool = False) -> "Relation":
        """Natural join on shared columns (DataJoint ``*`` / ``.join(left=True)``).

        Ref: spike_sorting.py:153,197-203; streams_maker.py:210-211.
        Catalyst/AQE picks broadcast for small sides; no hint needed in
        the common dim-join case.
        """
        on = _shared_cols(self.df, other.df)
        how = "left" if left else "inner"
        if not on:
            joined = self.df.crossJoin(other.df)
        else:
            joined = self.df.join(other.df, on, how)
        pk = list(dict.fromkeys([*self.pk, *other.pk]))
        return Relation(joined, pk)

    def __mul__(self, other: "Relation") -> "Relation":
        return self.join(other)

    # -- projection ----------------------------------------------------------

    def proj(self, *attrs: str, **named: str) -> "Relation":
        """DataJoint ``.proj()``: select attrs (+ PK always), rename
        (``new='old'``), compute (``new='<sql expr>'``), exclude
        (``'-col'``), or ``'*'`` = keep everything.

        Ref: acquisition.py:630-633; ephys.py:779; spike_sorting.py:769.
        Pure column pruning / expression projection → Catalyst pushes the
        pruned schema into the Parquet scan.
        """
        cols = set(self.df.columns)
        keep_all = "*" in attrs
        excluded = {a[1:] for a in attrs if a.startswith("-")}
        plain = [a for a in attrs if not a.startswith("-") and a != "*"]
        renames = {new: spec for new, spec in named.items() if spec in cols}
        renamed_olds = set(renames.values())  # a renamed column is GONE under its old name

        out_cols: list[Column] = []
        names_seen: list[str] = []

        base = list(cols - excluded) if keep_all else list(dict.fromkeys([*self.pk, *plain]))
        for c in self.df.columns:  # preserve original ordering
            if c in base and c not in excluded and c not in renamed_olds:
                out_cols.append(F.col(c))
                names_seen.append(c)
        for new, spec in named.items():
            if spec in cols:  # rename
                out_cols.append(F.col(spec).alias(new))
            else:  # computed SQL expression
                out_cols.append(F.expr(spec).alias(new))
            names_seen.append(new)
        new_pk = [c for c in self.pk if c in names_seen] + [
            new for new, old in renames.items() if old in self.pk
        ]
        return Relation(self.df.select(*out_cols), new_pk)

    # -- aggregation ---------------------------------------------------------

    def aggr(self, other: "Relation", *attrs: str, keep_all_rows: bool = False, **aggs: str) -> "Relation":
        """DataJoint ``.aggr(other, x='MAX(col)')``: group *other* by
        self's PK and attach aggregates to self's rows.

        Ref: tracking.py:73-76; spike_sorting.py:1278-1296. Compiles to
        groupBy + join; map-side partial aggregation is automatic.
        """
        on = _shared_cols(self.df, other.df)
        exprs = [F.expr(spec).alias(name) for name, spec in aggs.items()]
        if on:
            grouped = other.df.groupBy(*on).agg(*exprs)
            how = "left" if keep_all_rows else "inner"
            joined = self.df.join(grouped, on, how)
        else:
            # disjoint headings: attach the GLOBAL aggregate to every row
            joined = self.df.crossJoin(other.df.agg(*exprs))
        rel = Relation(joined, self.pk)
        if attrs:
            return rel.proj(*attrs, **{k: k for k in aggs})
        return rel

    # -- union ---------------------------------------------------------------

    def __add__(self, other: "Relation") -> "Relation":
        """DataJoint ``+``: union of same-heading relations, distinct on
        the primary key (well-formed operands carry identical rows per
        PK; with no PK declared, full-row distinct).
        Ref: spike_sorting.py:1297-1299."""
        u = self.df.unionByName(other.df)
        return self._with(u.dropDuplicates(self.pk) if self.pk else u.dropDuplicates())

    # -- top -----------------------------------------------------------------

    def top(self, limit: int = 1, order_by: str | list[str] = "", offset: int = 0) -> "Relation":
        """``dj.Top(limit, order_by)``. Ref: ephys.py:788-790;
        subject.py:184-195. For per-group top-k use
        ``operators.windows.top_k_per_group`` (row_number) instead —
        a global sort+limit is fine, a per-group collect is not."""
        df = self.df
        if order_by:
            specs = [order_by] if isinstance(order_by, str) else list(order_by)
            cols = []
            for s in specs:
                s = s.strip()
                if s.lower().endswith(" desc"):
                    cols.append(F.col(s[:-5].strip()).desc())
                else:
                    cols.append(F.col(s.removesuffix(" ASC").removesuffix(" asc").strip()).asc())
            df = df.orderBy(*cols)
        if offset:
            df = df.offset(offset)
        return self._with(df.limit(limit))

    # -- consumption ---------------------------------------------------------

    def fetch(self):
        """Materialize to pandas (the reference's fetch → numpy/pandas)."""
        return self.df.toPandas()

    def __len__(self) -> int:
        return self.df.count()


class U:
    """``dj.U()`` universal set.

    ``U('a','b') & rel`` → distinct projection of rel onto (a, b)
    (spike_sorting.py:1278). ``U().aggr(rel, x='max(col)')`` → global
    scalar aggregate (tracking.py:73-76). ``U('a').aggr(rel, ...)`` →
    grouped aggregate keyed by arbitrary (non-PK) columns.
    """

    def __init__(self, *attrs: str):
        self.attrs = list(attrs)

    def __and__(self, rel: Relation) -> Relation:
        return Relation(rel.df.select(*self.attrs).dropDuplicates(), self.attrs)

    def aggr(self, rel: Relation, **aggs: str) -> Relation:
        exprs = [F.expr(spec).alias(name) for name, spec in aggs.items()]
        if self.attrs:
            df = rel.df.groupBy(*self.attrs).agg(*exprs)
        else:
            df = rel.df.agg(*exprs)
        return Relation(df, self.attrs)
