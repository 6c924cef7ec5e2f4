"""As-of join — an operator Spark lacks natively.

Composition choice per the preference order (built-ins first): a generic
as-of join needs per-key ordered nearest-predecessor matching, which plain
DataFrame ops can only express via an O(n*m) range join; the idiomatic Spark
shape is grouped ``applyInPandas`` with ``pd.merge_asof`` per key — one
shuffle on the key for each side, sorted merge inside each group (Arrow both
ways, no per-row Python).

At 100 TB: both sides shuffle once on the join key (same cost class as any
equi-join); per-group data must fit in worker memory — for hot keys,
pre-split the right side by time range (the same slab trick as conversation
assembly).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    suffix: str = "_right",
    allow_exact_matches: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row of the same ``by`` key
    with right.on < left.on (strict predecessor by default, matching
    DuckDB's ``ASOF JOIN ... ON l.on > r.on`` semantics). Inner join: left
    rows with no predecessor are dropped.
    """
    right_cols = [c for c in right.columns if c != by]
    renamed = right
    for c in right_cols:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
    out_fields += [
        f"{f.name} {f.dataType.simpleString()}"
        for f in renamed.schema.fields
        if f.name != by
    ]
    schema = ", ".join(out_fields)
    on_right = on + suffix

    out_names = [c.split(" ")[0] for c in out_fields]

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:  # inner join semantics
            return pd.DataFrame(columns=out_names)
        lpdf = lpdf.sort_values(on, kind="mergesort")
        rpdf = rpdf.sort_values(on_right, kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]),
            left_on=on,
            right_on=on_right,
            allow_exact_matches=allow_exact_matches,
        )
        return merged.dropna(subset=[on_right])[out_names]

    return left.groupBy(by).cogroup(renamed.groupBy(by)).applyInPandas(merge, schema=schema)
