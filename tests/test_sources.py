"""Sources layer: CSV realignment semantics, XML loaders, sinks,
multimodal plumbing."""

import os

import pytest

SCHEMA_XML = """
<schema name="demo">
  <relation name="person">
    <attribute name="id" type="int" nullable="false"/>
    <attribute name="name" type="varchar(25)" size="25"/>
    <attribute name="note" type="text" HasSemanticMeaning="false"/>
    <primarykey><attr>id</attr></primarykey>
  </relation>
  <relation name="pet">
    <attribute name="pid" type="int"/>
    <attribute name="owner" type="int"/>
    <foreignkey table="person"><from>owner</from><to>id</to></foreignkey>
  </relation>
</schema>
"""

MAPPING_XML = """
<mappings>
  <mapping id="m1">
    <source><relation>person</relation></source>
    <target><relation>t_person</relation></target>
    <gold_sql>INSERT INTO t_person SELECT id, name FROM person</gold_sql>
  </mapping>
  <mapping id="m2">
    <source><relation>person</relation><relation>pet</relation></source>
    <target><relation>t_person</relation></target>
    <gold_sql>INSERT INTO t_person SELECT id, name FROM person JOIN pet ON owner = id</gold_sql>
    <select_sql>SELECT * FROM t_person</select_sql>
  </mapping>
</mappings>
"""


def test_csv_realignment(spark, tmp_path):
    """S3 semantics: all-string read, rename drift, drop row_id, add missing
    as NULL, project in schema order (InstanceDataHandler.py:104-410)."""
    from scalable_data_integration_with_llms_spark.sources.readers import read_instance_csv

    p = tmp_path / "inst.csv"
    p.write_text("row_id,CustName,balance\n1,alice,10.5\n2,bob,\n")
    df = read_instance_csv(
        spark,
        str(p),
        schema_cols=["name", "balance", "segment"],
        renames={"CustName": "name"},
    )
    assert df.columns == ["name", "balance", "segment"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
    rows = {r.name: r for r in df.collect()}
    assert rows["alice"].balance == "10.5"
    assert rows["alice"].segment is None
    assert rows["bob"].balance is None


def test_schema_xml_loader():
    from scalable_data_integration_with_llms_spark.sources.xml_loader import load_schema_xml

    cat = load_schema_xml(SCHEMA_XML)
    person = cat.rel("person")
    assert person.pk == ["id"]
    assert not person.attr("id").nullable
    assert person.attr("name").size == 25
    assert not person.attr("note").meaningful
    assert person.meaningful == ["id", "name"]
    assert cat.rel("pet").foreign_keys == [(("owner",), "person", ("id",))]


def test_mapping_xml_loader_and_subsumption():
    from scalable_data_integration_with_llms_spark.sources.xml_loader import (
        load_mapping_xml,
        remove_subsumed_rules,
    )

    rules = load_mapping_xml(MAPPING_XML)
    assert [r.rule_id for r in rules] == ["m1", "m2"]
    assert rules[1].join_overlap_sql == "SELECT * FROM t_person"
    kept = remove_subsumed_rules(rules)
    assert [r.rule_id for r in kept] == ["m2"]  # m1 ⊆ m2 on both sides


def test_sinks_roundtrip(spark, tmp_path):
    from scalable_data_integration_with_llms_spark.sources.sinks import cached_parquet, report_markdown, write_result_envelope

    calls = []

    def build():
        calls.append(1)
        return spark.range(5).toDF("k")

    path = str(tmp_path / "cache.parquet")
    a = cached_parquet(spark, path, build)
    b = cached_parquet(spark, path, build)
    assert a.count() == 5 and b.count() == 5
    assert len(calls) == 1  # second read hits the cache

    md = report_markdown(spark.createDataFrame([("x", 1)], "name string, n int"))
    assert "name" in md and "x" in md

    env_path = str(tmp_path / "out" / "results.json")
    write_result_envelope(env_path, {"mode": "test"}, [{"f1": 1.0}], 1.23)
    import json

    with open(env_path) as f:
        env = json.load(f)
    assert env["config"]["mode"] == "test" and env["generation_time"] == 1.23


def test_multimodal_plumbing(spark):
    """Schema/batch-shape/1→N contract with the deterministic fake decoder;
    the real decoder rejects payloads with no shipped pixel codec."""
    import numpy as np

    from scalable_data_integration_with_llms_spark.operators.multimodal import (
        attach_media,
        extract_features,
        fake_image_decoder,
        real_decoder,
    )

    docs = spark.createDataFrame([(1, "hello world"), (2, "spark engine")], "doc_id long, text string")
    media = attach_media(docs, "text", "doc_id")
    feats = extract_features(media, decode_fn=fake_image_decoder, frames_per_item=3)
    rows = feats.collect()
    assert len(rows) == 6  # 2 docs × 3 frames
    r = rows[0]
    assert len(r.feature) == 8
    assert r.n_bytes == len("hello world")
    # deterministic across runs
    again = extract_features(media, decode_fn=fake_image_decoder, frames_per_item=3).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))

    with pytest.raises(ValueError):
        real_decoder(b"not a known signature", "image/png")


def test_multimodal_query_registered(spark):
    from scalable_data_integration_with_llms_spark.queries import ORACLES, QUERIES

    assert "q_multimodal_features" in QUERIES
    assert "q_multimodal_features" in ORACLES  # real decode, value-oracled
    df = QUERIES["q_multimodal_features"](spark, "/root/testdata/sf0.001")
    assert df.count() == 500  # one stat row per document's synthesized PNG


def test_xlsx_report_sink(spark, tmp_path):
    """K2 Excel sink: the stdlib OOXML writer produces a structurally valid
    .xlsx — zip parts present, workbook wired to the sheet, header + typed
    cells round-trip through an XML parse."""
    import xml.etree.ElementTree as ET
    import zipfile

    from scalable_data_integration_with_llms_spark.sources.sinks import report_xlsx

    df = spark.createDataFrame(
        [("a & b", 3, 1.5, True), ("<c>", 4, 2.5, False)],
        "name string, n int, score double, flag boolean",
    )
    path = str(tmp_path / "report.xlsx")
    report_xlsx(df, path, sheet_name="metrics")

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {
            "[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
        } <= names
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
        assert wb.find("m:sheets/m:sheet", ns).get("name") == "metrics"
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = sheet.findall("m:sheetData/m:row", ns)
        assert len(rows) == 3  # header + 2 data rows
        header = [c.find("m:is/m:t", ns).text for c in rows[0]]
        assert header == ["name", "n", "score", "flag"]
        r1 = rows[1]
        assert r1[0].find("m:is/m:t", ns).text == "a & b"  # escape round-trip
        assert r1[1].get("t") is None and r1[1].find("m:v", ns).text == "3"
        assert r1[3].get("t") == "b"


def test_bibtex_parser_grammar():
    from scalable_data_integration_with_llms_spark.sources.bibtex import (
        merge_first_name_first,
        parse_bib_text,
        split_authors,
    )

    text = """
    @string{me = {unused}}
    @article(paren1, title = "Quoted Title", year = 2000)
    @Book{caps, title = {Braces {Keep} Case}, note = {a,
      multiline, value}}
    """
    es = parse_bib_text(text)
    assert [e["entry_type"] for e in es] == ["article", "book"]
    assert es[0]["key"] == "paren1" and es[0]["fields"]["title"] == "Quoted Title"
    assert es[0]["fields"]["year"] == "2000"
    assert es[1]["fields"]["title"] == "Braces {Keep} Case"
    assert es[1]["fields"]["note"] == "a, multiline, value"

    assert split_authors("Doe, John and Alice Smith and {Research and Co}") == [
        "Doe, John",
        "Alice Smith",
        "{Research and Co}",
    ]
    assert merge_first_name_first("Doe, John") == "John Doe"
    assert merge_first_name_first("von Neumann, Jr, John") == "John von Neumann Jr"
    assert merge_first_name_first("Plain Name") == "Plain Name"
    assert merge_first_name_first("{Research and Co}") == "Research and Co"


def test_bibtex_malformed_input_terminates():
    """An unterminated quoted value must not hang the field loop (r3/r4
    ADVICE: ``find('\"') == -1`` used to reset the scan position to 0)."""
    from scalable_data_integration_with_llms_spark.sources.bibtex import parse_bib_text

    es = parse_bib_text('@article{bad, title = "never closed, year = 1999}')
    assert len(es) == 1 and es[0]["key"] == "bad"
    # the unterminated value consumes to end-of-body; parsing terminates
    assert es[0]["fields"]["title"].startswith("never closed")

    # unterminated value mid-entry: later well-formed entries still parse
    es2 = parse_bib_text(
        '@article{bad, note = "oops}\n@article{good, year = 2001}'
    )
    assert any(e["key"] == "good" and e["fields"].get("year") == "2001" for e in es2)


def test_bibtex_first_seen_dim(spark):
    from scalable_data_integration_with_llms_spark.sources.bibtex import (
        author_dim_first_seen,
        author_occurrences,
        bib_entries_df,
    )

    text = """
    @article{a, author = {Doe, John and Alice Smith}}
    @article{b, author = {john doe and Bob Crow}}
    """
    occ = author_occurrences(bib_entries_df(spark, text))
    ids = {r.name: r.name_id for r in author_dim_first_seen(occ).collect()}
    # title-casing folds "john doe" into "John Doe"; first-seen order ids
    assert ids == {"John Doe": 0, "Alice Smith": 1, "Bob Crow": 2}


def test_xlsx_roundtrip_hostile_values(spark, tmp_path):
    """The K2 xlsx sink and the q_sink_roundtrip parse-back survive the
    hostile cases the round-8 review flagged: NULL cells (self-closing
    <c/>) keep their column position via cell refs, and XML entities
    un-escape on the way back."""
    from scalable_data_integration_with_llms_spark.queries.sinks_q import _xlsx_rows
    from scalable_data_integration_with_llms_spark.sources.sinks import report_xlsx

    rows = [
        (None, 1),                 # NULL first column -> self-closing cell A
        ("a&b<c>\"d\"", 2),        # every escapable character
        ("plain", 3),
    ]
    df = spark.createDataFrame(rows, "o_orderstatus string, n_orders bigint")
    path = str(tmp_path / "hostile.xlsx")
    report_xlsx(df.orderBy(df.n_orders), path)
    assert _xlsx_rows(path) == rows
