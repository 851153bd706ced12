"""Source-operator tests: nested JSON flattening (S5 + M6 quirk) and the
delimited/ragged tabular reader (S2-S4), mirroring FIXTURES.md §2/§4."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bytefreq_spark.sources.json_flatten import flatten_json, profile_json
from bytefreq_spark.sources.tabular import field_count_report, read_delimited

NDJSON = [
    {"customer": {"address": {"postcode": "SW1 1AA"}},
     "organisation": {"address": {"postcode": "EC1 1BB"}}},
    {"customer": {"address": {"postcode": "M1 1AA"}},
     "organisation": {"address": {"postcode": None}}},
]

GEOJSON = [
    {"geometry": {"type": "Point", "coordinates": [62.0171126, -6.7834625]},
     "properties": {"city": "Sandavágur", "street": "Heiðavegur", "number": "32"},
     "type": "Feature"},
]


@pytest.fixture(scope="module")
def ndjson_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("json") / "rows.ndjson"
    with open(p, "w") as f:
        for row in NDJSON:
            f.write(json.dumps(row) + "\n")
    return spark.read.json(str(p))


@pytest.fixture(scope="module")
def geo_df(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("geo") / "rows.ndjson"
    with open(p, "w") as f:
        for row in GEOJSON:
            f.write(json.dumps(row) + "\n")
    return spark.read.json(str(p))


def test_flatten_dot_paths(ndjson_df):
    out = flatten_json(ndjson_df).collect()
    paths = {r["path"] for r in out}
    assert paths == {
        "customer.address.postcode", "organisation.address.postcode"
    }
    vals = {(r["path"], r["value"]) for r in out}
    # M6: JSON strings keep their quotes; null → literal 'null'
    assert ("customer.address.postcode", '"SW1 1AA"') in vals
    assert ("organisation.address.postcode", "null") in vals


def test_flatten_array_indices(geo_df):
    out = flatten_json(geo_df).collect()
    d = {r["path"]: r["value"] for r in out}
    assert d["geometry.coordinates[0]"] == "62.0171126"
    assert d["geometry.coordinates[1]"] == "-6.7834625"
    assert d["geometry.type"] == '"Point"'
    assert d["properties.city"] == '"Sandavágur"'
    assert d["type"] == '"Feature"'


def test_flatten_array_collapse(geo_df):
    out = flatten_json(geo_df, collapse_arrays=True).collect()
    paths = [r["path"] for r in out]
    assert paths.count("geometry.coordinates[]") == 2
    assert "geometry.coordinates[0]" not in paths


def test_profile_json_masks_quoted(ndjson_df):
    rep = {(r["column"], r["pattern"]): r["count"]
           for r in profile_json(ndjson_df, grain="LU").collect()}
    # '"SW1 1AA"' → HU '"AA9 9AA"' → LU '"A9 9A"'
    assert rep[("customer.address.postcode", '"A9 9A"')] == 2
    assert rep[("organisation.address.postcode", '"A9 9A"')] == 1
    assert rep[("organisation.address.postcode", "a")] == 1  # 'null' → LU 'a'


def test_read_delimited_ragged(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("pip") / "data.pip"
    p.write_text(
        "Company Name|RegAddress.PostCode| Country \n"
        "ACME LTD|SW1 1AA|England\n"
        "BETA PLC|M1 1AA|Wales|EXTRA1|EXTRA2\n"
        "GAMMA|EC1 1BB|Scotland\n"
    )
    df = read_delimited(spark, str(p))
    # header names trimmed, spaces→_
    assert df.columns == [
        "Company_Name", "RegAddress.PostCode", "Country", "RaggedErr0", "RaggedErr1"
    ]
    rows = {r["Company_Name"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows["BETA PLC"]["RaggedErr0"] == "EXTRA1"
    assert rows["ACME LTD"]["RaggedErr0"] is None
    assert rows["GAMMA"]["Country"] == "Scotland"


def test_field_count_report(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("pip2") / "d.pip"
    p.write_text("a|b|c\n1|2\n1|2|3|4\n")
    lines = spark.read.text(str(p))
    got = {(r["n_fields"], r["rows"]) for r in field_count_report(lines).collect()}
    assert got == {(2, 1), (3, 1), (4, 1)}
