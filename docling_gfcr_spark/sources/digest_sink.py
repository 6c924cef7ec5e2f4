"""`digestsink` — a custom Spark data SINK (Python DataSource V2 writer).

Completes the custom-source surface (transcripts_source.py provides the
batch reader with filter pushdown and the micro-batch stream reader; this
module provides the writer): an AUDIT SINK that materializes nothing but a
tiny manifest of verifiable facts about the DataFrame it consumed —

- per-task row counts and an ORDER-INSENSITIVE content digest (sum of
  per-row md5 fragments mod 2^63, so any task/partition assignment yields
  the identical total),
- committed atomically by the driver as one ``manifest.json``
  (write-to-temp + rename; ``abort`` leaves no manifest).

The 100 TB use: cheap end-of-job corpus checksums — re-run the sink on a
re-materialized table and diff two 200-byte manifests instead of 100 TB of
rows. The commit protocol mirrors lineage.ParquetStorage's discipline:
work happens in tasks, a single atomic driver-side commit publishes.

    register_digest_sink(spark)
    df.write.format("digestsink").mode("overwrite")
      .option("path", "/out/audit").save()
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

_MOD = 1 << 63


def _row_key(row) -> str:
    """UNAMBIGUOUS canonical row serialization: each field rendered as
    ``<type-tag><len>:<str>`` and concatenated. The length prefix kills
    delimiter ambiguity ('a|b','c' vs 'a','b|c'); the type tag kills value
    ambiguity — None ('n') vs '' ('s0:'), int 1 ('i1:1') vs str '1'
    ('s1:1') vs bool True ('bTrue'), so a rewrite that degrades column
    types cannot produce an equal digest."""
    parts = []
    for v in row:
        if v is None:
            parts.append("n")
        elif isinstance(v, bool):  # before int: bool is an int subclass
            parts.append(f"b{v}")
        elif isinstance(v, int):
            s = str(v)
            parts.append(f"i{len(s)}:{s}")
        elif isinstance(v, float):
            s = repr(v)
            parts.append(f"f{len(s)}:{s}")
        else:
            s = str(v)
            parts.append(f"s{len(s)}:{s}")
    return "".join(parts)


def _fold(rows) -> tuple[int, int]:
    """(n_rows, order-insensitive digest) — THE shared fold for the
    distributed writer and the local oracle (one definition, zero drift)."""
    n = 0
    acc = 0
    for row in rows:
        acc = (acc + int(hashlib.md5(_row_key(row).encode("utf-8")).hexdigest()[:15], 16)) % _MOD
        n += 1
    return n, acc


class _DigestCommit(WriterCommitMessage):
    def __init__(self, n_rows: int, digest: int):
        self.n_rows = n_rows
        self.digest = digest


class _DigestWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite
        # fail FAST on the driver, before the distributed scan runs — a
        # commit-time check would digest the full corpus and then refuse
        manifest = os.path.join(path, "manifest.json")
        if os.path.exists(manifest) and not overwrite:
            raise FileExistsError(f"{manifest} exists and mode is not overwrite")

    def write(self, iterator):
        return _DigestCommit(*_fold(iterator))

    def commit(self, messages):
        manifest = {
            "n_rows": sum(m.n_rows for m in messages),
            "digest": sum(m.digest for m in messages) % _MOD,
            "n_tasks": len(messages),
        }
        out = os.path.join(self.path, "manifest.json")
        if os.path.exists(out) and not self.overwrite:
            raise FileExistsError(f"{out} exists and mode is not overwrite")
        os.makedirs(self.path, exist_ok=True)
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, out)  # atomic publish

    def abort(self, messages):
        # nothing was published; best-effort cleanup of a stale tmp file
        try:
            os.remove(os.path.join(self.path, "manifest.json.tmp"))
        except OSError:
            pass


class DigestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "digestsink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("digestsink requires .option('path', ...)")
        return _DigestWriter(path, overwrite)


def register_digest_sink(spark) -> None:
    spark.dataSource.register(DigestSinkDataSource)


def local_manifest(rows) -> dict:
    """Single-threaded oracle: the manifest any partitioning must produce."""
    n, acc = _fold(rows)
    return {"n_rows": n, "digest": acc}
