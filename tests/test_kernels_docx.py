"""Real-binary DOCX kernel (kernels/docx_binary.py).

The reference converts actual .docx bytes via docling
(/root/reference/scripts/convert.py:76-110); this kernel does it with stdlib
zipfile + xml.etree. Invariants pinned here:

- byte-kernel output == sidecar assembler output for the same document spec
  (so the two office routes agree on the markdown flavor)
- document order is honored (tables interleaved between paragraphs)
- malformed containers raise ValueError (the pipeline's parse_failed route)
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_gfcr_spark.kernels import docx_binary, office

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=1, max_size=40
).filter(lambda s: s.strip())
para_st = st.fixed_dictionaries(
    {
        "style": st.sampled_from(["Title", "Heading1", "Heading2", "Heading3",
                                  "Heading6", "List", "Normal", "Quote"]),
        "text": text_st,
    }
)
spec_st = st.fixed_dictionaries(
    {"paragraphs": st.lists(para_st, max_size=8)},
    optional={
        "tables": st.lists(
            st.lists(st.lists(text_st, min_size=1, max_size=4), min_size=1, max_size=4),
            max_size=2,
        )
    },
)


@settings(max_examples=150, deadline=None)
@given(spec=spec_st)
def test_bytes_kernel_matches_sidecar_assembler(spec):
    """docx_bytes_to_markdown(build_docx(spec)) == assemble_docx(spec) for any
    sidecar-shaped document (XML escaping, styles, tables, whitespace)."""
    got = docx_binary.docx_bytes_to_markdown(docx_binary.build_docx(spec))
    want = office.assemble_docx(json.dumps(spec))
    assert got == want


def test_build_docx_is_deterministic():
    spec = {"paragraphs": [{"style": "Title", "text": "t"}], "tables": [[["a", "b"]]]}
    assert docx_binary.build_docx(spec) == docx_binary.build_docx(spec)


def test_real_zip_structure():
    import io
    import zipfile

    blob = docx_binary.build_docx({"paragraphs": [{"style": "Normal", "text": "x"}]})
    assert blob[:2] == b"PK"
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        names = set(zf.namelist())
    assert {"[Content_Types].xml", "_rels/.rels", "word/document.xml"} <= names


def test_document_order_interleaves_tables():
    """A hand-built document.xml with p / tbl / p keeps document order (the
    sidecar shape can't express this — the bytes kernel must)."""
    doc = (
        '<?xml version="1.0"?>'
        f'<w:document xmlns:w="{docx_binary.W_NS}"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>h</w:t></w:r></w:p></w:tc></w:tr>"
        "<w:tr><w:tc><w:p><w:r><w:t>v</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    got = docx_binary.docx_bytes_to_markdown(buf.getvalue())
    assert got == "before\n\n| h |\n| --- |\n| v |\n\nafter"


def test_multi_run_and_tab_and_break():
    doc = (
        '<?xml version="1.0"?>'
        f'<w:document xmlns:w="{docx_binary.W_NS}"><w:body>'
        "<w:p><w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r>"
        "<w:r><w:br/><w:t>c</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert docx_binary.docx_bytes_to_markdown(buf.getvalue()) == "a\tb c"


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"not a zip at all",
        b"PK\x03\x04" + bytes(40),  # zip magic, corrupt body
    ],
)
def test_malformed_container_raises_valueerror(blob):
    with pytest.raises(ValueError):
        docx_binary.docx_bytes_to_markdown(blob)


def test_zip_without_document_xml_raises():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(ValueError):
        docx_binary.docx_bytes_to_markdown(buf.getvalue())


def test_malformed_inner_xml_raises():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document><unclosed")
    with pytest.raises(ValueError):
        docx_binary.docx_bytes_to_markdown(buf.getvalue())


def test_generator_payloads_roundtrip():
    """Every non-junk generator payload parses; junk payloads raise."""
    import base64

    from docling_gfcr_spark import transcripts

    n_ok = n_junk = 0
    for seed in range(300):
        rng = np.random.RandomState(seed)
        blob = base64.b64decode(transcripts.build_docx_b64_payload(rng))
        try:
            md = docx_binary.docx_bytes_to_markdown(blob)
            assert md.startswith("# ")
            n_ok += 1
        except ValueError:
            n_junk += 1
    assert n_ok > 200 and 0 < n_junk < 60
