"""Office-document text-stream sidecar assembly (docx / xlsx / pptx).

The reference whitelists ``.docx .xlsx .pptx`` and hands them to the docling
library (/root/reference/scripts/convert.py:32-41, :76-110). Native Office
parsers aren't cluster-safe here (no python-docx/openpyxl on executors), so —
consistent with the existing ``pdf_text`` shape (FIXTURES.md §A2) — Office
payloads arrive as TEXT-STREAM SIDECARS: the upstream ingest extracts the
document's text skeleton into a small JSON structure, and these kernels
assemble it into the same markdown flavor docling emits (headings, bullet
lists, pipe tables — the golden ``manual-de-redacao.md`` shape, SURVEY.md §5).

Sidecar shapes (all keys optional beyond the top-level one):

- docx:  ``{"paragraphs": [{"style": "Heading1|Heading2|...|List|Title|Normal",
  "text": "..."}], "tables": [[[cell,...],...], ...]}``
- xlsx:  ``{"sheets": {"Sheet name": [[cell, ...], ...], ...}}``
- pptx:  ``{"slides": [{"title": "...", "bullets": ["...", ...]}, ...]}``

Pure functions of the payload string: raise ``ValueError`` on malformed JSON
(the pipeline routes that to the parse_failed path, never a task failure).
"""

from __future__ import annotations

import json

_HEADING_STYLES = {f"Heading{i}": i for i in range(1, 7)}


def pipe_table(rows: list[list]) -> list[str]:
    """Markdown pipe table: first row is the header (golden-fixture flavor)."""
    if not rows:
        return []
    cells = [[str(c) if c is not None else "" for c in row] for row in rows]
    width = max(len(r) for r in cells)
    cells = [r + [""] * (width - len(r)) for r in cells]
    out = ["| " + " | ".join(cells[0]) + " |"]
    out.append("|" + "|".join([" --- "] * width) + "|")
    out.extend("| " + " | ".join(r) + " |" for r in cells[1:])
    return out


def assemble_docx(payload: str) -> str:
    """Paragraph stream -> markdown (headings by style, List -> bullets)."""
    doc = json.loads(payload)
    if not isinstance(doc, dict):
        raise ValueError("docx sidecar is not an object")
    blocks: list[str] = []
    for para in doc.get("paragraphs", []):
        style = str(para.get("style", "Normal"))
        text = str(para.get("text", "")).strip()
        if not text:
            continue
        if style == "Title":
            blocks.append(f"# {text}")
        elif style in _HEADING_STYLES:
            blocks.append("#" * _HEADING_STYLES[style] + f" {text}")
        elif style == "List":
            blocks.append(f"- {text}")
        else:
            blocks.append(text)
    for table in doc.get("tables", []):
        lines = pipe_table(table)
        if lines:
            blocks.append("\n".join(lines))
    return "\n\n".join(blocks)


def assemble_xlsx(payload: str) -> str:
    """Sheet grids -> one `## sheet` section + pipe table per sheet."""
    doc = json.loads(payload)
    if not isinstance(doc, dict):
        raise ValueError("xlsx sidecar is not an object")
    blocks: list[str] = []
    for sheet, rows in doc.get("sheets", {}).items():
        blocks.append(f"## {sheet}")
        lines = pipe_table(rows)
        if lines:
            blocks.append("\n".join(lines))
    return "\n\n".join(blocks)


def assemble_pptx(payload: str) -> str:
    """Slide stream -> `# title` + bullets per slide."""
    doc = json.loads(payload)
    if not isinstance(doc, dict):
        raise ValueError("pptx sidecar is not an object")
    blocks: list[str] = []
    for i, slide in enumerate(doc.get("slides", [])):
        title = str(slide.get("title", "") or "").strip() or f"Slide {i + 1}"
        blocks.append(f"# {title}")
        for b in slide.get("bullets", []):
            s = str(b).strip()
            if s:
                blocks.append(f"- {s}")
    return "\n\n".join(blocks)
