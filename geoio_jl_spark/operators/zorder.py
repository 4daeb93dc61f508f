"""Z-order (Morton) spatial clustering for point tables.

At 100 TB the dominant cost of a bbox/cell query is how many parquet
files the scan must open. Writing point tables sorted by the Morton
interleave of their cell coordinates packs spatially-near rows into the
same files, so parquet min/max footer statistics on `cell_id` (and on
`zorder` itself) prune most files for any spatial range — the same trick
Delta's OPTIMIZE ZORDER applies.

`zorder_col` is pure JVM column arithmetic (shift/mask interleave via
the classic parallel-prefix spreads — no UDF); `write_spatially_clustered`
is repartitionByRange(zorder) + sortWithinPartitions, which gives
non-overlapping zorder ranges per output file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREADS = [  # magic-number bit spreads: x | (x << s) & m, 16 → 32 bits
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of c so bit k lands at position 2k."""
    out = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREADS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zorder_col(i: Column | str, j: Column | str) -> Column:
    """Morton interleave of two 16-bit grid coordinates → 32-bit z."""
    ci = F.col(i) if isinstance(i, str) else i
    cj = F.col(j) if isinstance(j, str) else j
    return _spread16(ci).bitwiseOR(F.shiftleft(_spread16(cj), 1))


def write_spatially_clustered(df: DataFrame, path: str, i: str, j: str,
                              n_files: int = 16) -> None:
    """Range-partition + sort by zorder: each output file holds one
    contiguous, non-overlapping Morton range (tight cell_id min/max
    footer stats → file skipping on spatial predicates)."""
    (df.withColumn("zorder", zorder_col(i, j))
       .repartitionByRange(n_files, "zorder")
       .sortWithinPartitions("zorder")
       .write.mode("overwrite").parquet(path))
