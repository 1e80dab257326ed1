"""Z-order (Morton) keys for multi-dimensional data layout.

Sorting a 100 TB table by one column gives min/max row-group pruning on
that column only; sorting by the BIT-INTERLEAVED key of several columns
gives useful pruning on ALL of them at once — the standard lakehouse
Z-ORDER/cluster-by technique. Writing partitions ordered by the Morton
key makes a 2-D box predicate (user range × time range) touch a small
set of row groups instead of scanning everything.

Pure integer Catalyst expressions (literal shifts only), bit-identical
in any engine, so the key itself is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into the integer grid [0, 2^bits): linear
    scale, floor, clamp. IEEE double scale + floor is identically
    rounded cross-engine; values outside [lo, hi] clamp to the edges."""
    cells = (1 << bits) - 1
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(cells + 1))
    )
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)).cast("long")


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each (already
    quantized, non-negative) column — column i contributes bit b to key
    position ``b * len(cols) + i``. With d columns × ``bits`` bits the
    key spans d·bits bits (keep ≤ 62 for a signed long).

    All shift amounts are Python literals, so the whole key is one
    codegen-friendly integer expression — no UDF, no loop at runtime.
    """
    d = len(cols)
    if d * bits > 62:
        raise ValueError(f"zorder_key: {d} cols x {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * d + i))
    return key
