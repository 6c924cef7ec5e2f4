"""Multi-dimensional data layout: Z-order (Morton) clustering for writes.

The 100 TB problem: parquet/Iceberg min-max pruning only skips files whose
value RANGES exclude the predicate — a layout sorted by one column prunes
that column only. Z-ordering interleaves the bits of several columns' rank
buckets so files end up clustered in EVERY participating dimension at once
(the Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort-order idea).

Scale shape — no global sort of raw values anywhere:

1. per column, ``approxQuantile`` computes 2^bits - 1 boundary values (a
   tiny driver-side list from a sketch, not a shuffle);
2. each row's per-column bucket = #boundaries below its value (a folded
   literal-array expression, codegen'd);
3. buckets' bits interleave into one Morton key (shift/or expressions);
4. ``repartitionByRange`` on the key (sampled range exchange) +
   ``sortWithinPartitions`` writes one well-clustered file per range.

Numeric columns only (ranks come from quantile boundaries); strings ride by
hashing or a derived numeric first. Effectiveness is tested, not assumed:
tests/test_operators.py measures per-file value spans against a round-robin
layout on BOTH dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_bucket(col_name: str, boundaries: list[float]) -> Column:
    """Rank bucket of a numeric column against sorted quantile boundaries:
    ``#boundaries strictly below the value`` — 0..len(boundaries). Nulls
    land in bucket 0 (comparison is null-safe false)."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(col_name) > b, 1).otherwise(0),
    )


def morton_key(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` of each bucket column into one Morton
    key: output bit (i * n_cols + j) = bit i of column j."""
    n = len(bucket_cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(bucket_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 4,
    n_files: int = 8,
    rel_err: float = 0.01,
) -> None:
    """Write ``df`` to ``path`` clustered by the Z-order of ``cols``.

    One pass for the quantile sketches, one range exchange for the write —
    the same cost as a plain sorted write, but every listed column prunes.
    """
    if "_zkey" in df.columns:
        raise ValueError("df already has a _zkey column — rename it before zorder_write")
    probs = [k / (1 << bits) for k in range(1, 1 << bits)]
    # one multi-column call = one scan for ALL sketches (per-column calls
    # would re-scan the table len(cols) times)
    boundaries = dict(zip(cols, df.stat.approxQuantile(cols, probs, rel_err)))
    buckets = [quantile_bucket(c, boundaries[c]) for c in cols]
    key = morton_key(buckets, bits).alias("_zkey")
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
