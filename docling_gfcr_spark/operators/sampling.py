"""Deterministic sampling / split assignment for training-data pipelines.

Random sampling is wrong for dataset curation at scale: re-runs must land
every row in the same split regardless of partitioning, cluster size, or
retry history. These operators derive a uniform [0,1) value from
``md5(salt:id)`` and threshold it — a pure function of the row, portable
across engines (the DuckDB oracle computes the identical hex strings), and
exactly the trick lineage bucketing already uses (lineage.with_part_id).

Thresholds are compared as 8-hex-char STRINGS (lowercase md5 output), so no
engine-specific hex->int conversion is involved: u < f  <=>  hex8 <
format(floor(f * 2^32), '08x').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex8(id_col: str, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
    )


def _threshold_hex(fraction: float) -> str:
    return format(min(int(fraction * 2**32), 2**32 - 1), "08x")


def sample_predicate(fraction: float, id_col: str = "doc_id", salt: str = "sample") -> Column:
    """Keep-row predicate for a ~``fraction`` md5 hash sample. ``fraction >=
    1.0`` short-circuits to always-true: the threshold comparison is strict
    '<' against a hex clamp of 2^32-1, which would otherwise silently drop
    rows whose hex8 is exactly 'ffffffff'."""
    if fraction >= 1.0:
        return F.lit(True)
    return _hex8(id_col, salt) < _threshold_hex(fraction)


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, decided per-row by md5 — stable across
    runs, partitionings and engines (unlike ``DataFrame.sample``)."""
    return df.where(sample_predicate(fraction, id_col, salt))


def split_column(
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> Column:
    """'train'/'val'/'test' (or custom) assignment column."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    h = _hex8(id_col, salt)
    acc = 0.0
    expr = None
    for w, name in zip(weights[:-1], names[:-1]):
        acc += w
        # a cumulative weight reaching 1.0 before the last name must capture
        # EVERY row (strict '<' against the hex clamp would leak 'ffffffff')
        cond = F.lit(True) if acc >= 1.0 else h < _threshold_hex(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1])).alias("split")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    return df.withColumn("split", split_column(id_col, weights, names, salt))


def ngram_decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """GPT-3-style n-gram decontamination: flag training docs sharing any
    word k-gram with a heldout/benchmark set. The heldout shingle set is
    tiny relative to the corpus (benchmarks are KBs, corpora are TBs), so it
    broadcasts and the training side is one scan + map-side semi-join-style
    hash probe — no corpus shuffle. Returns (id, n_shared_shingles) for
    every contaminated training doc."""
    from docling_gfcr_spark.operators.dedup import word_shingles

    held_sh = heldout.select(
        F.explode(F.array_distinct(word_shingles(text_col, k))).alias("shingle")
    ).distinct()
    tr_sh = train.select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(text_col, k))).alias("shingle")
    )
    return (
        tr_sh.join(F.broadcast(held_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_shingles"))
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    bucket_size: int = 10_000,
) -> DataFrame:
    """Greedy sequential packing: assign each doc (in ``id_col`` order) to
    training-sequence bin ``floor(tokens_before / budget)`` — the standard
    approximate pack-by-running-total used when batching documents into
    fixed-token training sequences.

    The running total is a DISTRIBUTED PREFIX SUM, not a global window: a
    single ``sum() OVER (ORDER BY id)`` collapses the whole table into one
    sort partition (the classic scale-killer). Instead ids are bucketed into
    coarse ranges; per-bucket totals (a tiny table — n/bucket_size rows) get
    the only global window, and the per-doc running sum is a window
    partitioned BY bucket plus the broadcast bucket offset. Semantics are
    identical to the global window (the DuckDB oracle computes exactly that).
    Output: input columns + ``tokens_before`` + ``seq_bin``.
    """
    from pyspark.sql import Window

    bkt = F.floor(F.col(id_col) / bucket_size).alias("_bkt")
    base = df.select(F.col(id_col), F.col(token_col), bkt)
    bucket_tot = base.groupBy("_bkt").agg(F.sum(token_col).alias("_btot"))
    w_b = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_tot.select(
        "_bkt", F.coalesce(F.sum("_btot").over(w_b), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "tokens_before",
            (F.col("_boff") + F.coalesce(F.sum(token_col).over(w_in), F.lit(0))).cast("long"),
        )
        .withColumn("seq_bin", F.floor(F.col("tokens_before") / budget).cast("long"))
        .drop("_bkt", "_boff")
    )
