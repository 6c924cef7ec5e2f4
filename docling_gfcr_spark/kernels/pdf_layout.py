"""PDF layout parsing + reading-order reconstruction over page text streams.

The reference's PDF path (operator S3, /root/reference/scripts/convert.py:113-128)
iterates pages in physical order and wraps each page as
``"\\n\\n# Página {i+1}\\n\\n{text}"`` joined with ``"\\n"`` — that exact format
string is preserved here (the validate rule A2 keys on the literal
``'# Página'`` marker, /root/reference/scripts/markdown_agent.py:251-252).

At 100 TB scale the payload column carries *page text streams*, not binary
PDFs (no native PDF libs on executors — SURVEY.md §7.3). The synthetic/
ingested stream format handled here:

- pages separated by form-feed ``\\x0c``;
- within a page, text *blocks* separated by blank lines;
- a block MAY carry a layout marker prefix ``[[x,y]]`` (PDF-extractor
  coordinates in points). Reading order is reconstructed column-major:
  blocks with x < column_split read before blocks with x >= column_split,
  each column top-to-bottom by y — the standard two-column academic layout.
  Unmarked blocks keep stream order (single-column).
- hyphenated line breaks (``word-\\nrest``) are de-hyphenated.
"""

from __future__ import annotations

import re

PAGE_SEP = "\x0c"
PAGE_HEADER_FMT = "\n\n# Página {num}\n\n{text}"  # byte-identical to S3
_MARKER_RE = re.compile(r"^\[\[(\d+(?:\.\d+)?),(\d+(?:\.\d+)?)\]\]\s*")
_DEHYPHEN_RE = re.compile(r"(\w)-\n(\w)")
_BLOCK_SPLIT_RE = re.compile(r"\n\s*\n")

COLUMN_SPLIT_X = 300.0  # points; half of a 600pt text area


def _parse_blocks(page: str) -> list[tuple[float | None, float | None, str]]:
    """Split a page into (x, y, text) blocks; x/y None when unmarked."""
    blocks = []
    for chunk in _BLOCK_SPLIT_RE.split(page):
        if not chunk.strip():
            continue
        m = _MARKER_RE.match(chunk)
        if m:
            blocks.append((float(m.group(1)), float(m.group(2)), chunk[m.end():].strip("\n")))
        else:
            blocks.append((None, None, chunk.strip("\n")))
    return blocks


def reading_order(blocks: list[tuple[float | None, float | None, str]]) -> list[str]:
    """Column-major reading order; unmarked blocks keep their stream position.

    Marked blocks are stably sorted by (column, y, x); the stable sort keeps
    the original stream order for exact ties, making the kernel fully
    deterministic.
    """
    marked = [(i, b) for i, b in enumerate(blocks) if b[0] is not None]
    order = sorted(
        marked,
        key=lambda ib: (ib[1][0] >= COLUMN_SPLIT_X, ib[1][1], ib[1][0], ib[0]),
    )
    it = iter(order)
    out: list[str] = []
    for b in blocks:
        if b[0] is None:
            out.append(b[2])
        else:
            out.append(next(it)[1][2])
    return out


def dehyphenate(text: str) -> str:
    """Join words split across lines by a trailing hyphen."""
    return _DEHYPHEN_RE.sub(r"\1\2", text)


def assemble_pages(pages: list[str]) -> str:
    """Reference S3 page assembly over an explicit page list (the FIXTURES.md
    `pdf_text` shape: extracted page streams as a JSON array)."""
    return "\n".join(
        PAGE_HEADER_FMT.format(num=i + 1, text=page) for i, page in enumerate(pages)
    )


def assemble_pdf(stream: str) -> dict:
    """Parse a page stream -> reading-ordered text in the reference's S3 format.

    Returns dict(text, n_pages, n_blocks, parse_failed). Never raises (O1).
    """
    if stream is None:
        return {"text": "", "n_pages": 0, "n_blocks": 0, "parse_failed": True}
    try:
        pages = stream.split(PAGE_SEP)
        parts: list[str] = []
        n_blocks = 0
        for page_index, page in enumerate(pages):
            blocks = _parse_blocks(page)
            n_blocks += len(blocks)
            ordered = reading_order(blocks)
            page_text = dehyphenate("\n\n".join(ordered))
            parts.append(PAGE_HEADER_FMT.format(num=page_index + 1, text=page_text))
        return {
            "text": "\n".join(parts),
            "n_pages": len(pages),
            "n_blocks": n_blocks,
            "parse_failed": False,
        }
    except Exception:
        return {"text": stream, "n_pages": 0, "n_blocks": 0, "parse_failed": True}
