"""Real-PDF bytes kernel (kernels/pdf_binary.py) + its pipeline route."""

from __future__ import annotations

import base64

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_gfcr_spark.kernels import pdf_binary
from docling_gfcr_spark.kernels.pdf_layout import assemble_pages

line_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=40
).map(lambda s: s.replace("\n", " ").replace("\r", " "))
pages_st = st.lists(st.lists(line_st, max_size=5), min_size=1, max_size=4)


@settings(max_examples=150, deadline=None)
@given(pages=pages_st)
def test_build_parse_roundtrip(pages):
    """Any latin-1-representable page content round-trips byte-exactly
    through a real PDF container (string escapes included)."""
    safe = [[l.encode("latin-1", "replace").decode("latin-1") for l in p] for p in pages]
    got = pdf_binary.pdf_bytes_to_pages(pdf_binary.build_pdf(safe))
    assert got == ["\n".join(p) for p in safe]


def test_valid_pdf_skeleton():
    blob = pdf_binary.build_pdf([["a"], ["b"]])
    assert blob.startswith(b"%PDF-1.4") and blob.rstrip().endswith(b"%%EOF")
    assert blob.count(b"/Type /Page ") == 2 or blob.count(b"/Type /Page\n") == 2 or blob.count(b"/Type /Page /Parent") == 2
    assert b"xref" in blob and b"trailer" in blob
    # xref offset actually points at the xref table
    start = int(blob.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0].strip())
    assert blob[start : start + 4] == b"xref"


def test_tj_array_and_octal_and_escapes():
    import re

    old_op, new_op = b"(x) Tj", b"[(he) -20 (llo)] TJ 0 -14 Td (\\101\\052\\)) Tj"
    blob = pdf_binary.build_pdf([["x"]])
    # splice in the richer operators AND keep /Length honest (the parser
    # slices streams by /Length per the spec)
    m = re.search(rb"/Length (\d+)", blob)
    old_len = int(m.group(1))
    blob = blob.replace(old_op, new_op).replace(
        b"/Length %d" % old_len, b"/Length %d" % (old_len + len(new_op) - len(old_op)), 1
    )
    assert pdf_binary.pdf_bytes_to_pages(blob) == ["hello\nA*)"]


@pytest.mark.parametrize(
    "blob",
    [b"", b"junk", b"%PDF-1.4\nnothing here", b"%PDF-1.4\n1 0 obj\n<<>>\nendobj\n"],
)
def test_malformed_raises(blob):
    with pytest.raises(ValueError):
        pdf_binary.pdf_bytes_to_pages(blob)


def test_flate_streams_parse_other_filters_rejected():
    """FlateDecode (stdlib zlib) round-trips; exotic filters raise."""
    pages = [["alpha beta gamma", "second line"], ["page two"]]
    flate = pdf_binary.build_pdf(pages, compress=True)
    assert b"/FlateDecode" in flate
    assert pdf_binary.pdf_bytes_to_pages(flate) == ["\n".join(p) for p in pages]
    dct = pdf_binary.build_pdf([["x"]])
    dct = dct.replace(b"<< /Length", b"<< /Filter /DCTDecode /Length", 1)
    with pytest.raises(ValueError, match="Filter"):
        pdf_binary.pdf_bytes_to_pages(dct)
    # corrupted flate payload -> clear error, not a zlib traceback
    bad = pdf_binary.build_pdf([["y"]])
    bad = bad.replace(b"<< /Length", b"<< /Filter /FlateDecode /Length", 1)
    with pytest.raises(ValueError, match="FlateDecode"):
        pdf_binary.pdf_bytes_to_pages(bad)


def test_route_through_pipeline_matches_pdf_text_assembly(spark):
    """pdf_b64 rows extract to the SAME S3 `# Página` assembly the pdf_text
    sidecar produces for identical page content; junk bytes produce the
    reference PDF-failure error record (row preserved)."""
    import json as _json

    from docling_gfcr_spark import pipeline, transcripts

    pages = [["alpha beta", "gamma"], ["delta"]]
    b64 = base64.b64encode(pdf_binary.build_pdf(pages)).decode()
    sidecar = _json.dumps(["\n".join(p) for p in pages])
    junk = base64.b64encode(b"%PDF-1.4\n not really").decode()
    df = spark.createDataFrame(
        [("c8", 0, "user", b64, "pdf_b64", None),
         ("c8", 1, "user", sidecar, "pdf_text", None),
         ("c8", 2, "user", junk, "pdf_b64", None)],
        schema=transcripts.SCHEMA,
    )
    out = pipeline.extract_turns(df, mode="cli").toPandas().sort_values("turn_idx")
    assert out.iloc[0]["extracted_text"] == out.iloc[1]["extracted_text"]
    assert out.iloc[0]["method"] == "pdf_bytes" and out.iloc[0]["success"]
    assert not out.iloc[2]["success"]
    assert "não pôde ser processado" in out.iloc[2]["error"]


def test_generator_payloads_roundtrip():
    n_ok = n_junk = 0
    from docling_gfcr_spark import transcripts

    for seed in range(300):
        rng = np.random.RandomState(seed)
        blob = base64.b64decode(transcripts.build_pdf_b64_payload(rng))
        try:
            pages = pdf_binary.pdf_bytes_to_pages(blob)
            assert pages and all(isinstance(p, str) for p in pages)
            assert assemble_pages(pages).startswith("\n\n# Página 1\n\n")
            n_ok += 1
        except ValueError:
            n_junk += 1
    assert n_ok > 220 and 0 < n_junk < 70


def test_flate_stream_ending_in_carriage_return_parses():
    """Regression: compressed payloads whose zlib bytes END in 0x0D must
    slice exactly via /Length (an endstream-scan eats that byte as EOL and
    truncates the stream — ~1/256 of valid Flate PDFs). The document parser
    (pdf_doc) slices by /Length whenever it is present; this pins the
    end-to-end behavior on real zlib outputs ending in 0x0D."""
    import random
    import zlib

    rng = random.Random(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,;:!?-"
    found = 0
    for _ in range(5000):
        line = "".join(rng.choice(alphabet) for _ in range(rng.randrange(10, 80)))
        ops = b"BT /F1 12 Tf 72 720 Td\n(" + line.encode() + b") Tj\nET"
        if zlib.compress(ops, 9).endswith(b"\r"):
            blob = pdf_binary.build_pdf([[line]], compress=True)
            assert pdf_binary.pdf_bytes_to_pages(blob) == [line]
            found += 1
            if found >= 3:
                break
    assert found >= 3, "search window produced no 0x0D-terminated streams"
