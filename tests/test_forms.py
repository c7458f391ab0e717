"""Form-data extraction (M2/M3) against the reference's real W-9
sample + the Spark MapType surface."""

import base64
from pathlib import Path

import pytest

from pdftotext_spark.core.forms import (
    extract_form_data,
    map_form_data,
    parse_form_template,
)

EXAMPLES = Path("/root/reference/examples/formdata-extraction")

pytestmark = pytest.mark.skipif(
    not EXAMPLES.exists(), reason="reference examples not available"
)


@pytest.fixture(scope="module")
def w9_pdf() -> bytes:
    return (EXAMPLES / "sample.pdf").read_bytes()


@pytest.fixture(scope="module")
def w9_template() -> str:
    return (EXAMPLES / "sample.xml").read_text(encoding="utf-8-sig")


def test_raw_xfa_fields(w9_pdf):
    raw = extract_form_data(w9_pdf)
    assert raw["f1_1"] == "ZZNAME"
    assert raw["f1_2"] == "ZZBUSINESSNAME"
    assert raw["f1_11"] == "123" and raw["f1_13"] == "6789"
    # incremental update wins: the filled datasets, not the empty one
    assert raw["f1_10"] == "ZZACCOUNTNUMBERS"


def test_template_mapping(w9_pdf, w9_template):
    mapped = extract_form_data(w9_pdf, w9_template)
    assert mapped["Name"] == "ZZNAME"
    assert mapped["City"] == "ZZCITY"
    # choice field: c1_1='6' → constant from the case table
    assert mapped["FederalTaxClassification"] == "TAXCLASS_LIMITED_LIABILITY_COMPANY"
    # group concatenation with separator
    assert mapped["SSN"] == "123-45-6789"
    assert mapped["EIN"] == "EI-ZZEMP"


def test_template_parse_shapes(w9_template):
    t = parse_form_template(w9_template)
    assert t.form_class == "W9"
    assert any(f.type == "choice" and f.cases for f in t.fields)
    assert {g.name for g in t.groups} == {"SSN", "EIN"}


def test_choice_default():
    t = parse_form_template(
        """<forms class="X"><form version="1">
        <field name="C" form-field="c1" type="choice">
          <case value="1" constant="ONE"/><default constant="NONE"/>
        </field></form></forms>"""
    )
    assert map_form_data({"c1": "9"}, t)["C"] == "NONE"
    assert map_form_data({}, t)["C"] == "NONE"


def test_multi_version_template_selection():
    from pdftotext_spark.core.forms import (
        parse_form_templates,
        select_form_template,
    )

    xml = """<forms class="X">
      <form version="Rev 2014">
        <field name="A" form-field="f1" type="string"/>
      </form>
      <form version="Rev 2018">
        <field name="B" form-field="f1" type="string"/>
        <group name="G" separator=":" fields="B, B"/>
      </form>
    </forms>"""
    ts = parse_form_templates(xml)
    assert [t.version for t in ts] == ["Rev 2014", "Rev 2018"]
    assert select_form_template(ts, "Rev 2018").fields[0].name == "B"
    assert select_form_template(ts, "Rev 2014").fields[0].name == "A"
    # unknown / missing version degrades to the first definition
    assert select_form_template(ts, "Rev 2099").version == "Rev 2014"
    assert select_form_template(ts, None).version == "Rev 2014"


def test_no_form_data_is_empty():
    from pdftotext_spark.sources import pdfbuilder as pb

    assert extract_form_data(pb.simple_pdf([["no forms here"]])) == {}


@pytest.mark.spark
def test_extract_forms_dataframe(spark, w9_pdf, w9_template):
    from pyspark.sql import functions as F

    from pdftotext_spark.functions.forms import extract_forms

    payload = "%B64%" + base64.b64encode(w9_pdf).decode()
    df = spark.createDataFrame(
        [("c0", 0, payload), ("c0", 1, "no pdf here")],
        "conv_id string, turn_idx int, text string",
    )
    out = extract_forms(df, w9_template).orderBy("turn_idx").collect()
    assert out[0].form_fields["SSN"] == "123-45-6789"
    assert out[0].n_fields > 10
    assert out[1].n_fields == 0


def test_shipped_form_template_parses():
    """The reference's FormTemplates/US-IRS-W9.xml (the library's own
    shipped template, distinct from the example's) parses and maps."""
    from pathlib import Path

    p = Path("/root/reference/FormTemplates/US-IRS-W9.xml")
    if not p.exists():
        pytest.skip("shipped template not available")
    t = parse_form_template(p.read_text(encoding="utf-8-sig"))
    assert t.form_class == "W9"
    assert len(t.fields) >= 15
    assert {g.name for g in t.groups} == {"SSN", "EIN"}
    assert any(f.type == "choice" and f.cases for f in t.fields)
