"""As-of join — an operator Spark lacks natively.

Composition choice per the preference order (built-ins first): a generic
as-of join needs per-key ordered nearest-predecessor matching, which plain
DataFrame ops can only express via an O(n*m) range join; the idiomatic Spark
shape is grouped ``applyInPandas`` with ``pd.merge_asof`` per group — one
shuffle on the key for each side, sorted merge inside each group (Arrow both
ways, no per-row Python).

Scale/skew design: grouping by the raw key alone loads one user's entire
history into a single worker (a key with 10^8 right rows OOMs at 100x).
The default path therefore pre-splits every key into TIME SLABS of
``slab_seconds`` and co-groups on (key, slab); cross-slab lookback is restored
by carrying, into each left slab, the single latest right row from all
earlier slabs (computed with one small per-(key, slab) aggregate + one
window — no quadratic slab join). Per-group memory is then bounded by the
densest single slab, never by the whole key.

Determinism: within equal ``on`` values the winning right row is the one
maximal under (on, <remaining right columns>) — pinned by explicit sorts so
output is stable across partitionings and runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(col, dtype: str):
    # TIMESTAMP_NTZ won't cast straight to double; bounce via timestamp
    if dtype.startswith("timestamp"):
        return col.cast("timestamp").cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    allow_exact_matches: bool = False,
    slab_seconds: float | None = 86400.0,
    hot_key_threshold: int = 50_000,
    hot_keys: list | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row of the same ``by`` key
    with right.on < left.on (strict predecessor by default, matching
    DuckDB's ``ASOF JOIN ... ON l.on > r.on`` semantics). Inner join: left
    rows with no predecessor are dropped; null ``on`` values never match.

    ``slab_seconds`` bounds per-group memory for hot keys (see module
    docstring); pass ``None`` to co-group on the bare key (only safe when no
    key is pathologically large). Slabbing is applied ONLY to keys whose row
    count (either side) exceeds ``hot_key_threshold`` — splitting every key
    would explode the group count (keys x slabs) and per-group scheduling
    overhead dwarfs the work for normal keys; cold keys stay one group.
    """
    right_cols = [c for c in right.columns if c != by]
    renamed = right
    for c in right_cols:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    on_right = on + suffix
    left = left.where(F.col(on).isNotNull())
    renamed = renamed.where(F.col(on_right).isNotNull())

    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    out_fields += [
        f"{f.name} {f.dataType.simpleString()}"
        for f in renamed.schema.fields
        if f.name != by
    ]
    schema = ", ".join(out_fields)
    out_names = [c.split(" ")[0] for c in out_fields]
    left_sort = [on] + [c for c in left.columns if c != on]
    right_sort = [on_right] + [c for c in renamed.columns if c not in (by, on_right)]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:  # inner join semantics
            return pd.DataFrame(columns=out_names)
        # deterministic tie-break: among equal `on` values merge_asof picks
        # the LAST right row, so sorting by (on, remaining cols) makes the
        # winner the max under that order — stable across partition order
        lpdf = lpdf.sort_values([c for c in left_sort if c in lpdf], kind="mergesort")
        rpdf = rpdf.sort_values([c for c in right_sort if c in rpdf], kind="mergesort")
        merged = pd.merge_asof(
            lpdf[[c for c in lpdf.columns if c in out_names or c == on]],
            rpdf[[c for c in rpdf.columns if (c in out_names or c == on_right) and c not in lpdf.columns]],
            left_on=on,
            right_on=on_right,
            allow_exact_matches=allow_exact_matches,
        )
        return merged.dropna(subset=[on_right])[out_names]

    if slab_seconds is None:
        return left.groupBy(by).cogroup(renamed.groupBy(by)).applyInPandas(merge, schema=schema)

    on_type = dict((f.name, f.dataType.simpleString()) for f in left.schema.fields)[on]
    slab_l = F.floor(_epoch(F.col(on), on_type) / F.lit(float(slab_seconds)))
    slab_r = F.floor(_epoch(F.col(on_right), on_type) / F.lit(float(slab_seconds)))

    # Hot-key census: one tiny map-side-combinable count per side, collected
    # to the driver (keys exceeding the threshold are few BY DEFINITION —
    # bounded by total_rows / threshold). Same eager-stats pattern AQE uses;
    # pass ``hot_keys`` explicitly to skip the census on huge inputs.
    if hot_keys is None:
        def key_counts(df: DataFrame) -> DataFrame:
            return df.select(F.col(by).alias("_k")).groupBy("_k").count()

        hot_keys = [
            r["_k"]
            for r in (
                key_counts(left)
                .unionByName(key_counts(renamed))
                .groupBy("_k").agg(F.max("count").alias("_cnt"))
                .where(F.col("_cnt") > hot_key_threshold)
                .collect()
            )
        ]
    if not hot_keys:
        # no pathological keys: plain per-key cogroup (one group per key,
        # no carry machinery, no extra union/window stages)
        return left.groupBy(by).cogroup(renamed.groupBy(by)).applyInPandas(merge, schema=schema)

    is_hot = F.col(by).isin(list(hot_keys))
    l2 = left.withColumn("_slab", F.when(is_hot, slab_l).otherwise(F.lit(0)).cast("long"))
    r2 = renamed.withColumn("_slab", F.when(is_hot, slab_r).otherwise(F.lit(0)).cast("long"))

    # latest right row per (key, slab): struct max is lexicographic, so
    # leading with `on_right` picks the latest, remaining cols break ties —
    # a tiny map-side-combinable aggregate, one row per (key, slab)
    r_struct = F.struct(F.col(on_right), *[F.col(c) for c in renamed.columns if c not in (by, on_right)])
    r_latest = r2.groupBy(by, "_slab").agg(F.max(r_struct).alias("_m"))

    # carry the latest strictly-earlier right row into each left slab:
    # order (slab, is_right) per key; for a left-slab marker, everything
    # strictly before it is an earlier slab's latest (same-slab rights sort
    # AFTER the marker), so last(ignorenulls) over the preceding frame is
    # exactly the cross-slab predecessor candidate
    from pyspark.sql import Window

    markers = l2.select(by, "_slab").distinct().withColumn("_is_r", F.lit(0)).withColumn("_m", F.lit(None).cast(r_latest.schema["_m"].dataType))
    tagged = r_latest.withColumn("_is_r", F.lit(1)).unionByName(markers)
    w = Window.partitionBy(by).orderBy("_slab", "_is_r").rowsBetween(Window.unboundedPreceding, -1)
    carried = (
        tagged.withColumn("_carry", F.last("_m", ignorenulls=True).over(w))
        .where((F.col("_is_r") == 0) & F.col("_carry").isNotNull())
        .select(by, "_slab", F.col("_carry").alias("_m"))
    )
    carried_rows = carried.select(
        by,
        "_slab",
        F.col("_m").getField(on_right).alias(on_right),
        *[
            F.col("_m").getField(c).alias(c)
            for c in renamed.columns
            if c not in (by, on_right)
        ],
    ).select(*r2.columns)

    candidates = r2.unionByName(carried_rows)
    joined = (
        l2.groupBy(by, "_slab")
        .cogroup(candidates.groupBy(by, "_slab"))
        .applyInPandas(merge, schema=schema)
    )
    return joined
