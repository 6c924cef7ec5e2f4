"""Real PDF byte-stream kernel (uncompressed content streams) — stdlib only.

The reference converts actual ``.pdf`` binaries via docling
(/root/reference/scripts/convert.py:113-128; golden artifact
``manual-de-redacao.pdf`` -> md). Full PDF needs codec libraries, but the
format's skeleton is plain text: objects, an object graph (Catalog -> Pages
-> Page -> Contents), and text-showing operators inside content streams.
This kernel handles the real-bytes cases that need no native libs —
uncompressed content streams AND ``/FlateDecode`` ones (stdlib ``zlib``),
which together cover the overwhelming majority of text PDFs in the wild.
Other filters (DCT, LZW, ...) raise a clear ``ValueError`` (the pipeline's
error envelope, matching the reference's behavior when conversion fails).

- :func:`build_pdf` — deterministic minimal-but-real PDF writer (correct
  xref byte offsets, one content stream per page, Helvetica Type1 font).
- :func:`pdf_bytes_to_pages` — parse the object graph in /Kids order,
  extract ``Tj`` / ``'`` / ``"`` / ``TJ`` text-showing operators per page
  (one text line per operator, PDF string escapes + octal decoded).

The extracted page list feeds the same S3 assembly (`# Página` headers)
as the ``pdf_text`` sidecar route, so downstream semantics are identical.
"""

from __future__ import annotations

import re

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+\s+\d+\s+R|\[(?:\s*\d+\s+\d+\s+R)*\s*\])")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
# direct integer /Length only: `/Length 6 0 R` (an indirect reference) must
# NOT slice the stream at the object number — the full parser (pdf_doc)
# resolves indirect lengths; this legacy regex now refuses to half-match
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
# a text-showing operator: literal string then Tj / ' / " ; or TJ array
_TJ_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)\s*(Tj|'|\")")
_TJ_ARRAY_RE = re.compile(rb"\[((?:[^\[\]\\]|\\.)*)\]\s*TJ")
_STR_IN_ARRAY_RE = re.compile(rb"\(((?:\\.|[^\\()])*)\)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"\\([0-7]{1,3})", raw[i:])
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i += 1 + len(m.group(1))
                continue
            i += 1  # lone backslash before EOL etc: PDF drops it
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _escape(text: str) -> bytes:
    raw = text.encode("latin-1", errors="replace")
    return raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _stream_payload(cobj: bytes, cid: int) -> tuple[bytes, bytes]:
    """(stream bytes, dict head) of a content object. Honors the dict's
    ``/Length`` — the spec's delimiter — so COMPRESSED payloads whose bytes
    happen to end in 0x0D are sliced exactly (an endstream-regex would eat
    that byte as part of its ``\\r?\\n`` and truncate ~1/256 of Flate
    streams). Falls back to the regex only when /Length is absent."""
    head, sep, rest = cobj.partition(b"stream")
    if not sep:
        raise ValueError(f"content object {cid} has no stream")
    if rest.startswith(b"\r\n"):
        body = rest[2:]
    elif rest.startswith(b"\n"):
        body = rest[1:]
    else:
        body = rest
    m = _LENGTH_RE.search(head)
    if m:
        n = int(m.group(1))
        if len(body) < n:
            raise ValueError(f"content object {cid} shorter than its /Length")
        return body[:n], head
    sm = _STREAM_RE.search(cobj)
    if sm is None:
        raise ValueError(f"content object {cid} has no stream")
    return sm.group(1), head


def pdf_bytes_to_pages(blob: bytes) -> list[str]:
    """Real PDF bytes -> per-page extracted text (one line per text-showing
    operator). Raises ``ValueError`` on non-PDF bytes, unsupported stream
    filters, or a broken object graph.

    Round 5: delegates to the full document parser (kernels/pdf_doc.py) —
    xref tables AND streams, object streams, indirect /Length resolution,
    balanced-paren string scanning, font-aware decoding — which subsumes the
    round-4 regex walker while keeping its exact output on the synthetic
    corpus (one line per show op, latin-1 default decode)."""
    from docling_gfcr_spark.kernels import pdf_doc

    return pdf_doc.parse_pdf_pages(blob, strict=True)


def build_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """Deterministic minimal-but-real PDF: header, Catalog -> Pages -> one
    Page + Contents stream per page (``compress=True`` -> FlateDecode via
    zlib level 9, still deterministic), Helvetica font, valid xref table and
    trailer. ``pages`` is a list of text-line lists."""
    n = len(pages)
    font_id = 3 + 2 * n
    objs: list[bytes] = []
    kid_ids = [3 + 2 * i for i in range(n)]
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # obj 1
    kids = b" ".join(b"%d 0 R" % k for k in kid_ids)
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n)  # obj 2
    for i, lines in enumerate(pages):
        page_id = kid_ids[i]
        content_id = page_id + 1
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (font_id, content_id)
        )
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _escape(line) + b") Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        if compress:
            import zlib

            stream = zlib.compress(stream, 9)
            objs.append(
                b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(stream)
                + stream
                + b"\nendstream"
            )
        else:
            objs.append(
                b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream"
            )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # font

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
