"""Input validation + table IO helpers.

- ``validate_input_schema``: the reference validates its input envelope with
  jsonschema before any work (V1, /root/reference/scripts/markdown_agent.py:444);
  here the contract is the input-hint DataFrame schema — fail fast with a
  field-by-field diff instead of a mid-job analysis error.
- ``write_bucketed`` / ``read_bucketed``: hash-bucketed tables so repeated
  joins/aggregations on the bucket key are co-located and need NO exchange —
  the storage-level answer to "don't shuffle the 100 TB side every query"
  (tests assert the join plan is exchange-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

INPUT_HINT_SCHEMA: dict[str, str] = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
}
# accepted spellings per field (parquet round-trips local timestamps as NTZ)
_COMPATIBLE: dict[str, set[str]] = {
    "turn_idx": {"int", "integer"},
    "ts": {"timestamp", "timestamp_ntz"},
}


def validate_input_schema(df: DataFrame) -> DataFrame:
    """Raise TypeError with a precise diff unless df matches the input hint
    ``(conv_id string, turn_idx int, role string, text string, tool string,
    ts timestamp)``. Returns df unchanged on success (chainable)."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems: list[str] = []
    for name, want in INPUT_HINT_SCHEMA.items():
        ok = _COMPATIBLE.get(name, {want})
        if name not in actual:
            problems.append(f"missing column {name}:{want}")
        elif actual[name] not in ok:
            problems.append(f"column {name} is {actual[name]}, want {want}")
    extra = [n for n in actual if n not in INPUT_HINT_SCHEMA]
    if extra:
        problems.append(f"unexpected columns {extra}")
    if problems:
        raise TypeError("transcripts schema mismatch: " + "; ".join(problems))
    return df


def write_bucketed(
    df: DataFrame, table: str, path: str, key: str, n_buckets: int = 64
) -> None:
    """Persist hash-bucketed + sorted by ``key`` (bucket metadata lives in the
    session catalog; on a cluster this is the Iceberg/HMS table)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
