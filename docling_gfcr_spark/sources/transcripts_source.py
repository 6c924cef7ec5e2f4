"""`transcripts` — a custom Spark data source (Python DataSource V2 API).

The reference ingests documents from the local filesystem one path at a time
(S1, /root/reference/scripts/convert.py:47-58). The rebuild's primary source
is a table, but a first-class SOURCE abstraction matters for the engine
surface: this module registers the deterministic transcripts generator as a
real `spark.read.format("transcripts")` source, so synthetic corpora compose
with everything that consumes a DataFrame — no helper-function plumbing:

    register_transcripts_source(spark)
    df = (spark.read.format("transcripts")
          .option("n_conv", 1000).option("seed", 7).load())

Scale shape: `partitions()` splits the conversation id-range into
``parallelism`` chunks; each executor generates its chunk locally (zero
shuffle, zero driver data — identical plan to the mapInPandas generator).
Rows are yielded as Arrow batches (``read`` yields pa.RecordBatch) so the
Python worker boundary is columnar, not per-row pickling.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _GeneratorOptions:
    """Shared option parsing — batch and stream readers MUST agree on
    defaults or the 'same deterministic corpus' equality breaks silently."""

    def __init__(self, options: dict):
        self.n_conv = int(options.get("n_conv", 100))
        self.seed = int(options.get("seed", 42))
        self.mean_turns = int(options.get("mean_turns", 8))
        self.mega_every = int(options.get("mega_every", 0))
        self.skew_factor = int(options.get("skew_factor", 50))
        self.parallelism = int(options.get("parallelism", 8))
        self.convs_per_batch = int(options.get("convs_per_batch", 10))

    def gen_range(self, lo: int, hi: int) -> list[dict]:
        from docling_gfcr_spark.transcripts import gen_conv_rows

        rows: list[dict] = []
        for conv_idx in range(lo, hi):
            rows.extend(
                gen_conv_rows(
                    self.seed, conv_idx, self.mean_turns, self.mega_every, self.skew_factor
                )
            )
        return rows


_ARROW_SCHEMA_FIELDS = (
    ("conv_id", "string"),
    ("turn_idx", "int32"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp[us]"),
)


class TranscriptsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.opts = _GeneratorOptions(options)
        # pushed-down conv id bounds (conv_id is 'conv-%08d', so string
        # comparisons on it are exactly integer comparisons on the index)
        self._lo, self._hi = 0, self.opts.n_conv

    def partitions(self):
        o = self.opts
        lo, hi = self._lo, min(self._hi, o.n_conv)
        if hi <= lo:
            return [_RangePartition(0, 0)]  # empty corpus, like the generator
        n = hi - lo
        n_parts = max(1, min(o.parallelism, n))
        step = -(-n // n_parts)  # ceil div
        return [_RangePartition(x, min(x + step, hi)) for x in range(lo, hi, step)]

    def read(self, partition: _RangePartition):
        # executor-side: generate this id-range locally, emit Arrow batches.
        # gen_conv_rows dicts carry exactly the six schema keys, so they feed
        # from_pylist directly — no per-row copying on the hot path.
        import pyarrow as pa

        rows = self.opts.gen_range(partition.start, partition.end)
        if not rows:
            return
        schema = pa.schema([(n, pa.type_for_alias(t)) for n, t in _ARROW_SCHEMA_FIELDS])
        yield pa.RecordBatch.from_pylist(rows, schema=schema)


class PushdownTranscriptsReader(TranscriptsReader):
    """Opt-in (``option('pushdown', 'true')``) because Spark REFUSES any
    reader that merely defines pushFilters when
    ``spark.sql.python.filterPushdown.enabled`` is false — a session that
    hasn't set the conf must still be able to read the default source."""

    def pushFilters(self, filters):
        """Native filter pushdown (DataSource V2): EqualTo / >= / <= on
        conv_id shrink the GENERATED id-range — rows that a WHERE clause
        would drop are never even produced. Everything else stays in Spark.
        """
        from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThanOrEqual

        def conv_index(value) -> int | None:
            # ONLY canonical 'conv-%08d' comparands: for anything else
            # (unpadded 'conv-7', 9-digit, arbitrary strings) string order
            # on the padded ids diverges from integer order, so consuming
            # the filter would return WRONG results — yield it back instead.
            if (
                isinstance(value, str)
                and len(value) == 13
                and value.startswith("conv-")
                and value[5:].isdigit()
                and value == f"conv-{int(value[5:]):08d}"
            ):
                return int(value[5:])
            return None

        if self.opts.n_conv > 10**8:
            # ids wider than 8 digits: padded-string order != integer order
            yield from filters
            return
        for f in filters:
            idx = conv_index(getattr(f, "value", None))
            if getattr(f, "attribute", None) == ("conv_id",) and idx is not None:
                if isinstance(f, EqualTo):
                    self._lo = max(self._lo, idx)
                    self._hi = min(self._hi, idx + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self._lo = max(self._lo, idx)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self._hi = min(self._hi, idx + 1)
                    continue
            yield f  # unsupported: Spark keeps evaluating it


class TranscriptsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same deterministic corpus: each batch emits
    the next ``convs_per_batch`` conversations (offset = next conv id, so a
    checkpoint-restart resumes exactly where it stopped — the offset is the
    whole source state). ``n_conv`` bounds the stream; after that, batches
    are empty (a bounded replay source for tests/backfills)."""

    def __init__(self, options: dict):
        self.opts = _GeneratorOptions(options)

    def initialOffset(self) -> dict:
        return {"next_conv": 0}

    def _rows(self, lo: int, hi: int):
        return [
            (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
            for r in self.opts.gen_range(lo, hi)
        ]

    def read(self, start: dict):
        lo = int(start["next_conv"])
        hi = min(lo + self.opts.convs_per_batch, self.opts.n_conv)
        return iter(self._rows(lo, hi)), {"next_conv": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # crash-recovery replay: Spark re-reads a WAL-planned-but-uncommitted
        # batch through this method on restart; without it the checkpoint is
        # permanently stuck (the base class raises NotImplementedError)
        return iter(self._rows(int(start["next_conv"]), int(end["next_conv"])))


class TranscriptsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "transcripts"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> TranscriptsReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return PushdownTranscriptsReader(self.options)
        return TranscriptsReader(self.options)

    def simpleStreamReader(self, schema) -> TranscriptsStreamReader:
        return TranscriptsStreamReader(self.options)


def register_transcripts_source(spark) -> None:
    spark.dataSource.register(TranscriptsDataSource)
