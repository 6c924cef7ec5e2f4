"""Real DOCX (OOXML WordprocessingML) byte-stream kernel — stdlib only.

The reference converts actual ``.docx`` binaries via the docling library
(/root/reference/scripts/convert.py:76-110; extension whitelist :32-41) into
the markdown flavor of the golden fixture (headings / bullets / pipe tables,
SURVEY.md §5). This kernel closes that fidelity gap without native deps: a
DOCX file is a PK-zip whose ``word/document.xml`` holds the paragraph and
table stream, so ``zipfile`` + ``xml.etree`` parse the real bytes on any
executor.

Two pure functions:

- :func:`docx_bytes_to_markdown` — PK-zip bytes -> markdown, honoring
  document order (paragraphs and tables interleaved as they appear in the
  body). Raises ``ValueError`` on anything that isn't a parseable DOCX; the
  pipeline routes that to the generic-fallback apology, never a task failure.
- :func:`build_docx` — deterministic minimal-but-real DOCX writer (fixed zip
  timestamps, ZIP_STORED) used by the transcript generator and tests. For a
  sidecar-shaped spec, ``docx_bytes_to_markdown(build_docx(spec))`` equals
  ``office.assemble_docx(json.dumps(spec))`` — pinned by tests.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import struct
import zipfile
import zlib
from xml.sax.saxutils import escape

from docling_gfcr_spark.kernels.office import pipe_table

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_W = f"{{{W_NS}}}"

# docling maps Word's built-in bullet/numbering styles to markdown list items;
# plain "List" is the sidecar spelling, "ListParagraph"/"ListBullet"/
# "ListNumber" the real-document style ids.
_LIST_STYLES = frozenset({"List", "ListParagraph", "ListBullet", "ListNumber"})
_HEADING_STYLES = {f"Heading{i}": i for i in range(1, 7)}

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument'
    '/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)


def _para_xml(style: str, text: str) -> str:
    ppr = f'<w:pPr><w:pStyle w:val="{escape(style, {chr(34): "&quot;"})}"/></w:pPr>' if style and style != "Normal" else ""
    return f'<w:p>{ppr}<w:r><w:t xml:space="preserve">{escape(text)}</w:t></w:r></w:p>'


def _table_xml(rows: list[list]) -> str:
    trs = []
    for row in rows:
        tcs = "".join(
            f"<w:tc>{_para_xml('Normal', str(c) if c is not None else '')}</w:tc>" for c in row
        )
        trs.append(f"<w:tr>{tcs}</w:tr>")
    return "<w:tbl>" + "".join(trs) + "</w:tbl>"


def build_docx(spec: dict) -> bytes:
    """Write a real minimal DOCX from a sidecar-shaped spec.

    ``spec`` = ``{"paragraphs": [{"style": ..., "text": ...}], "tables":
    [[[cell,...],...], ...]}`` (the kernels/office.py sidecar contract).
    Fully deterministic: fixed zip member timestamps, no compression.
    The real-document style id ``ListParagraph`` is written for the sidecar's
    ``List`` (both sides of the parity test map it to a bullet).
    """
    body = []
    for para in spec.get("paragraphs", []):
        style = str(para.get("style", "Normal"))
        if style == "List":
            style = "ListParagraph"
        body.append(_para_xml(style, str(para.get("text", ""))))
    for table in spec.get("tables", []):
        body.append(_table_xml(table))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>' + "".join(body) + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as zf:
        for arcname, payload in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", document),
        ):
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, payload.encode("utf-8"))
    return buf.getvalue()


def _run_text(p: ET.Element) -> str:
    """All text of a paragraph: ``w:t`` runs in order, tabs as tabs, line
    breaks as single spaces (docling flattens soft breaks inside a block)."""
    parts: list[str] = []
    for node in p.iter():
        if node.tag == f"{_W}t":
            parts.append(node.text or "")
        elif node.tag == f"{_W}tab":
            parts.append("\t")
        elif node.tag in (f"{_W}br", f"{_W}cr"):
            parts.append(" ")
    return "".join(parts)


def _para_style(p: ET.Element) -> str:
    el = p.find(f"{_W}pPr/{_W}pStyle")
    return el.get(f"{_W}val", "Normal") if el is not None else "Normal"


def _para_block(p: ET.Element) -> str | None:
    text = _run_text(p).strip()
    if not text:
        return None
    style = _para_style(p)
    if style == "Title":
        return f"# {text}"
    if style in _HEADING_STYLES:
        return "#" * _HEADING_STYLES[style] + f" {text}"
    if style in _LIST_STYLES:
        return f"- {text}"
    return text


def _table_block(tbl: ET.Element) -> str | None:
    rows: list[list[str]] = []
    for tr in tbl.findall(f"{_W}tr"):
        cells = []
        for tc in tr.findall(f"{_W}tc"):
            # a cell may hold several paragraphs (joined with a space); cell
            # text itself is NOT stripped — the sidecar assembler renders
            # cells verbatim, and the parity test holds the two routes equal
            cells.append(" ".join(_run_text(p) for p in tc.findall(f"{_W}p")))
        rows.append(cells)
    lines = pipe_table(rows)
    return "\n".join(lines) if lines else None


def docx_bytes_to_markdown(blob: bytes) -> str:
    """Real PK-zip DOCX bytes -> markdown (document order, office.py flavor).

    Raises ``ValueError`` on non-zip bytes, a missing ``word/document.xml``
    member, or malformed XML — the caller's parse_failed route.
    """
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            xml_bytes = zf.read("word/document.xml")
    # zipfile escapes more than BadZipFile on hostile bytes: mutated
    # compression-method fields raise NotImplementedError, an encryption
    # flag bit RuntimeError, corrupt deflate payloads zlib.error, truncated
    # members EOFError/struct.error — ALL must become the ValueError error
    # envelope, never kill the task
    except (zipfile.BadZipFile, KeyError, OSError, NotImplementedError,
            RuntimeError, EOFError, zlib.error, struct.error,
            zipfile.LargeZipFile) as e:
        raise ValueError(f"not a DOCX container: {type(e).__name__}") from e
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        raise ValueError(f"malformed document.xml: {e}") from e
    body = root.find(f"{_W}body")
    if body is None:
        raise ValueError("document.xml has no w:body")
    blocks: list[str] = []
    for child in body:
        if child.tag == f"{_W}p":
            b = _para_block(child)
        elif child.tag == f"{_W}tbl":
            b = _table_block(child)
        else:  # sectPr etc.
            b = None
        if b is not None:
            blocks.append(b)
    return "\n\n".join(blocks)
