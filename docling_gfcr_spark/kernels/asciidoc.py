"""AsciiDoc → markdown structural kernel.

The reference whitelists ``.adoc .asciidoc`` (/root/reference/scripts/
convert.py:32-41) and hands them to the docling library, which parses the
document structurally; until round 2 these kinds rode the generic text
fallback here. This kernel covers the load-bearing AsciiDoc constructs with
pure line transforms (docling's markdown flavor):

- ``= Title`` .. ``====== H6``  →  ``#`` .. ``######`` headings
- ``* item`` / ``** nested``    →  ``- item`` / ``  - nested`` bullets
- ``. item`` / ``.. nested``    →  ``1. item`` / ``  1. nested`` ordered
- ``----`` literal blocks       →  fenced code blocks (content untouched)
- ``:attr: value`` attribute-entry lines and ``// comment`` lines dropped

Everything else passes through verbatim. Total: a pure function of the
payload, no failure path (any string is valid AsciiDoc-ish input).
"""

from __future__ import annotations

import re

_HEADING = re.compile(r"^(={1,6})\s+(.*\S)\s*$")
_BULLET = re.compile(r"^(\*{1,5})\s+(.*\S)\s*$")
_ORDERED = re.compile(r"^(\.{1,5})\s+(.*\S)\s*$")
_ATTRIBUTE = re.compile(r"^:[A-Za-z0-9_][A-Za-z0-9_-]*!?:(\s|$)")
_LITERAL_FENCE = re.compile(r"^-{4,}\s*$")


def adoc_to_markdown(text: str) -> str:
    """Convert an AsciiDoc document to docling-flavored markdown."""
    out: list[str] = []
    in_literal = False
    for line in text.split("\n"):
        if _LITERAL_FENCE.match(line):
            out.append("```")
            in_literal = not in_literal
            continue
        if in_literal:
            out.append(line)
            continue
        if _ATTRIBUTE.match(line) or line.startswith("//"):
            continue
        m = _HEADING.match(line)
        if m:
            out.append("#" * len(m.group(1)) + " " + m.group(2))
            continue
        m = _BULLET.match(line)
        if m:
            out.append("  " * (len(m.group(1)) - 1) + "- " + m.group(2))
            continue
        m = _ORDERED.match(line)
        if m:
            out.append("  " * (len(m.group(1)) - 1) + "1. " + m.group(2))
            continue
        out.append(line)
    if in_literal:  # unterminated literal block: close the fence
        out.append("```")
    return "\n".join(out)
