"""Real-binary XLSX/PPTX kernels (kernels/office_binary.py).

Same contract as the DOCX bytes kernel: for any sidecar-shaped spec, parsing
the built real container must equal the sidecar assembler's markdown; real
OOXML mechanics (shared strings, cell refs with gaps, relationship-ordered
slides) are exercised directly; malformed containers raise ValueError."""

from __future__ import annotations

import json

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_gfcr_spark.kernels import office, office_binary

cell_st = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=0, max_size=24
    ),
)
xlsx_spec_st = st.fixed_dictionaries(
    {
        "sheets": st.dictionaries(
            st.text(alphabet="abcdefgXYZ 123", min_size=1, max_size=12),
            st.lists(st.lists(cell_st, min_size=1, max_size=5), min_size=0, max_size=5),
            min_size=0,
            max_size=3,
        )
    }
)
pptx_spec_st = st.fixed_dictionaries(
    {
        "slides": st.lists(
            st.fixed_dictionaries(
                {
                    "title": st.text(
                        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
                        max_size=30,
                    ),
                    "bullets": st.lists(
                        st.text(
                            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
                            max_size=30,
                        ),
                        max_size=5,
                    ),
                }
            ),
            max_size=4,
        )
    }
)


@settings(max_examples=120, deadline=None)
@given(spec=xlsx_spec_st)
def test_xlsx_bytes_kernel_matches_sidecar(spec):
    got = office_binary.xlsx_bytes_to_markdown(office_binary.build_xlsx(spec))
    want = office.assemble_xlsx(json.dumps(spec))
    assert got == want


@settings(max_examples=120, deadline=None)
@given(spec=pptx_spec_st)
def test_pptx_bytes_kernel_matches_sidecar(spec):
    got = office_binary.pptx_bytes_to_markdown(office_binary.build_pptx(spec))
    want = office.assemble_pptx(json.dumps(spec))
    assert got == want


def test_xlsx_shared_strings_and_cell_gaps():
    """Hand-built worksheet with a shared string, an inline string and a
    cell-ref gap (A1 then C1): gaps become empty cells, both string kinds
    resolve."""
    import io
    import zipfile

    ns = office_binary.MAIN_NS
    members = {
        "xl/workbook.xml": (
            f'<workbook xmlns="{ns}" xmlns:r="{office_binary.REL_NS}">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            f'<Relationships xmlns="{office_binary.PKG_REL_NS}">'
            f'<Relationship Id="rId1" Type="{office_binary.REL_NS}/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>'
        ),
        "xl/sharedStrings.xml": (
            f'<sst xmlns="{ns}"><si><t>from sst</t></si></sst>'
        ),
        "xl/worksheets/sheet1.xml": (
            f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
            '<c r="A1" t="s"><v>0</v></c>'
            '<c r="C1" t="inlineStr"><is><t>inline</t></is></c>'
            "</row></sheetData></worksheet>"
        ),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for k, v in members.items():
            zf.writestr(k, v)
    got = office_binary.xlsx_bytes_to_markdown(buf.getvalue())
    assert got == "## S\n\n| from sst |  | inline |\n| --- | --- | --- |"


def test_col_index():
    assert [office_binary.col_index(r) for r in ("A1", "B3", "Z9", "AA7", "AB12")] == [
        0, 1, 25, 26, 27,
    ]


def test_pptx_untitled_slide_falls_back():
    blob = office_binary.build_pptx({"slides": [{"title": "", "bullets": ["x"]}]})
    assert office_binary.pptx_bytes_to_markdown(blob) == "# Slide 1\n\n- x"


@pytest.mark.parametrize("fn", [office_binary.xlsx_bytes_to_markdown,
                                office_binary.pptx_bytes_to_markdown])
@pytest.mark.parametrize("blob", [b"", b"nope", b"PK\x03\x04" + bytes(40)])
def test_malformed_raises(fn, blob):
    with pytest.raises(ValueError):
        fn(blob)


def test_generator_payloads_roundtrip():
    import base64

    from docling_gfcr_spark import transcripts

    n_ok = n_junk = 0
    for seed in range(200):
        rng = np.random.RandomState(seed)
        for build, parse, head in (
            (transcripts.build_xlsx_b64_payload, office_binary.xlsx_bytes_to_markdown, "## "),
            (transcripts.build_pptx_b64_payload, office_binary.pptx_bytes_to_markdown, "# "),
        ):
            blob = base64.b64decode(build(np.random.RandomState(seed)))
            try:
                md = parse(blob)
                assert md.startswith(head)
                n_ok += 1
            except ValueError:
                n_junk += 1
    assert n_ok > 300 and 0 < n_junk < 80


def test_negative_shared_string_index_rejected():
    """Regression: a hostile '-1' sharedStrings index must raise (Python's
    negative indexing would silently return the LAST shared string)."""
    import io
    import zipfile

    ns = office_binary.MAIN_NS
    members = {
        "xl/workbook.xml": (
            f'<workbook xmlns="{ns}" xmlns:r="{office_binary.REL_NS}">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            f'<Relationships xmlns="{office_binary.PKG_REL_NS}">'
            f'<Relationship Id="rId1" Type="{office_binary.REL_NS}/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>'
        ),
        "xl/sharedStrings.xml": f'<sst xmlns="{ns}"><si><t>only</t></si></sst>',
        "xl/worksheets/sheet1.xml": (
            f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
            '<c r="A1" t="s"><v>-1</v></c></row></sheetData></worksheet>'
        ),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for k, v in members.items():
            zf.writestr(k, v)
    with pytest.raises(ValueError, match="sharedStrings"):
        office_binary.xlsx_bytes_to_markdown(buf.getvalue())


def test_absolute_opc_relationship_targets_parse():
    """Leading-slash relationship targets are ABSOLUTE part names (legal
    OPC); round-4 double-prefixed them to 'xl//xl/...' and errored."""
    import io
    import zipfile

    spec = {"sheets": {"S1": [["a", "b"], [1, 2]]}}
    blob = office_binary.build_xlsx(spec)
    want = office_binary.xlsx_bytes_to_markdown(blob)

    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        members = {n: zf.read(n) for n in zf.namelist()}
    members["xl/_rels/workbook.xml.rels"] = members["xl/_rels/workbook.xml.rels"].replace(
        b'Target="worksheets/sheet1.xml"', b'Target="/xl/worksheets/sheet1.xml"'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for k, v in members.items():
            zf.writestr(k, v)
    assert office_binary.xlsx_bytes_to_markdown(buf.getvalue()) == want
    assert office_binary._resolve_rel_target("/xl/worksheets/s1.xml", "xl") == "xl/worksheets/s1.xml"
    assert office_binary._resolve_rel_target("worksheets/s1.xml", "xl") == "xl/worksheets/s1.xml"
    assert office_binary._resolve_rel_target("xl/worksheets/s1.xml", "xl") == "xl/worksheets/s1.xml"
