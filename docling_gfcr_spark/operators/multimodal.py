"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a struct of metadata.
The Spark-side machinery (schema, Arrow batch shape, mapInPandas signature,
partitioning by modality) is real and tested; the actual codec work is
STUBBED — this container has no image/audio libraries — behind
``NotImplementedError`` plus a deterministic fake used by tests
(``fake_decode=True``), exactly as a production deploy would swap in
Pillow/torchaudio inside the same iterator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, mime string, n_bytes long"
)
FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, sha_prefix string, "
    "width int, height int, n_frames int, feature array<float>"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x00\x00\x00\x18ftyp": "video/mp4",
}


def sniff_mime(payload: bytes | None) -> str:
    if not payload:
        return "application/octet-stream"
    for magic, mime in _MAGIC.items():
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def _decode_stub(payload: bytes, modality: str, fake: bool) -> tuple[int, int, int, list[float]]:
    """(width, height, n_frames, feature). Real codecs NOT available here."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "container; deploy swaps this stub for Pillow/av inside the same "
            "mapInPandas iterator"
        )
    # deterministic fake: derive pseudo-dimensions + an 8-dim feature from bytes
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    rng = np.random.RandomState(h % (2**31))
    w_, h_ = 16 + h % 1024, 16 + (h >> 10) % 1024
    frames = 1 if modality == "image" else 1 + h % 32
    feat = rng.standard_normal(8).astype(np.float32)
    return int(w_), int(h_), int(frames), [float(x) for x in feat]


def extract_media_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """mapInPandas over binary payloads -> typed metadata + feature vector.

    Batch shape matters at scale: Arrow moves the binary column zero-copy to
    the Python worker; one iterator per partition amortizes codec init (the
    same pattern the reference uses for lazy docling import,
    /root/reference/scripts/convert.py:79-82).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                import hashlib

                w, h, nf, feat = _decode_stub(payload, r.modality, fake_decode)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "modality": r.modality,
                        "n_bytes": len(payload),
                        "sha_prefix": hashlib.sha256(payload).hexdigest()[:16],
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: text-derived bytes
    with real magic prefixes so mime sniffing has something to do."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magics = [b"\x89PNG", b"\xff\xd8\xff", b"RIFF", b"\x00\x00\x00\x18ftyp"]
        mods = ["image", "image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.RandomState(seed + int(i))
                m = int(i) % 4
                payload = magics[m] + rng.bytes(64 + int(i) % 256)
                rows.append(
                    {
                        "media_id": int(i),
                        "modality": mods[m],
                        "payload": payload,
                        "mime": sniff_mime(payload),
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def media_summary(df: DataFrame) -> DataFrame:
    """Partition-friendly rollup by modality/mime (plain Catalyst agg)."""
    return df.groupBy("modality", "mime").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
    )
