"""Rules-engine tests over the adversarial fixture shapes (FIXTURES.md §3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bytefreq_spark.rules import enhanced, enhanced_flat


def _one(df, field, *path):
    row = df.collect()[0]
    v = row[field]
    for p in path:
        v = v[p]
    return v


def test_date_rule_valid_and_invalid(spark):
    df = spark.createDataFrame(
        [("12/05/1990",), ("30/02/1999",), ("18/17/2230",), ("2015-12-31",), ("31-Dec-2015",)],
        ["IncorporationDate"],
    )
    out = enhanced(df).select(F.col("IncorporationDate.Rules.std_date").alias("d")).collect()
    got = [r["d"] for r in out]
    assert got[0] == "1990-05-12"      # dd/MM/yyyy priority over US format
    assert got[1] is None               # 30 Feb invalid
    assert got[2] is None               # month 17 invalid
    assert got[3] == "2015-12-31"
    assert got[4] == "2015-12-31"


def test_us_date_fallback(spark):
    # 12/31/2015 fails dd/MM (month 31) → US format fires
    df = spark.createDataFrame([("12/31/2015",)], ["somedate"])
    assert _one(enhanced(df), "somedate", "Rules", "std_date") == "2015-12-31"


def test_is_numeric_gate(spark):
    df = spark.createDataFrame([("42",), ("4.2",), ("abc",), ("4e2",)], ["v"])
    out = [r[0] for r in enhanced(df).select("v.Rules.is_numeric").collect()]
    # "4e2" masks to LU "9a9" → gate closed → NULL (reference parity)
    assert out == [True, True, None, None]


def test_uk_postcode(spark):
    # Reference gate quirk (assertions.rs:218): fires on lu=='A9 9A' OR
    # hu=='A9A 9A' — so 'SW1A 1AA' (lu='A9A 9A', hu='AA9A 9AA') does NOT fire.
    df = spark.createDataFrame(
        [("SW1 1AA",), ("M1 1AA",), ("ZZ9 9ZZ",), ("SW1A 1AA",), ("10001",)],
        ["postcode"],
    )
    rows = enhanced(df).select(
        F.col("postcode.Rules.is_uk_postcode").alias("pc"),
        F.col("postcode.Rules.poss_postal_country").alias("cands"),
    ).collect()
    assert rows[0]["pc"] is True
    assert rows[1]["pc"] is True
    assert rows[2]["pc"] is False   # gate open (lu='A9 9A'), regex rejects ZZ
    assert rows[3]["pc"] is None    # reference gate quirk
    assert rows[3]["cands"] == ["UK"]  # but UK candidate via lu='A9A 9A'
    assert rows[4]["pc"] is None
    assert rows[4]["cands"] is not None and "DE" in rows[4]["cands"]


def test_poss_postal_country_narrowing(spark):
    df = spark.createDataFrame([("1234",), ("0234",), ("91000",)], ["post_code"])
    rows = enhanced(df).select(F.col("post_code.Rules.poss_postal_country").alias("c")).collect()
    assert set(rows[0]["c"]) == set(
        ["AT", "BE", "BG", "CH", "CY", "CZ", "DK", "EE", "FI", "GR", "HU", "IE",
         "LT", "LU", "LV", "MT", "NL", "NO", "PL", "PT", "RO", "SE", "SI", "SK"]
    )
    assert rows[1]["c"] == ["NL"]   # hu 9999 + leading 0 → retain NL
    assert rows[2]["c"] == ["FR"]   # hu 99999 + leading 9 → retain FR


def test_country_iso3(spark):
    df = spark.createDataFrame(
        [("France",), ("Japan",), ("England",), ("Wales",), ("Narnia",), ("Fr4nce",)],
        ["Country"],
    )
    rows = enhanced(df).select(
        F.col("Country.Rules.std_country_iso3").alias("iso3"),
        F.col("Country.Rules.std_region_code").alias("region"),
    ).collect()
    assert [r["iso3"] for r in rows] == ["FRA", "JPN", "GBR", "GBR", None, None]
    assert rows[0]["region"] == "FRA-France"
    assert rows[2]["region"] == "GB-ENG"


def test_country_iso3_long_tail(spark):
    """r4: the dim covers the FULL ISO 3166 range (reference resolves ~250
    names via geonamescache, assertions.rs:20-36) — long-tail states and
    historic/alias names the old 74-entry dim missed."""
    from bytefreq_spark.rules import COUNTRY_ISO3

    assert len(set(COUNTRY_ISO3.values())) >= 240
    df = spark.createDataFrame(
        [("Ivory Coast",), ("Cabo Verde",), ("Eswatini",), ("San Marino",),
         ("Timor-Leste",), ("Burma",), ("North Macedonia",), ("Vatican City",),
         ("DR Congo",), ("Kyrgyzstan",), ("Saint Kitts and Nevis",),
         ("Côte d'Ivoire",)],
        ["Country"],
    )
    rows = enhanced(df).select(
        F.col("Country.Rules.std_country_iso3").alias("iso3")
    ).collect()
    assert [r["iso3"] for r in rows] == [
        "CIV", "CPV", "SWZ", "SMR", "TLS", "MMR", "MKD", "VAT", "COD",
        "KGZ", "KNA", "CIV",
    ]


def test_unix_timestamp(spark):
    df = spark.createDataFrame(
        [("1700000000",), ("1700000000000",), ("900000000",), ("170000",)],
        ["created_ts"],
    )
    rows = enhanced(df).select(
        F.col("created_ts.Rules.is_unix_timestamp").alias("u"),
        F.col("created_ts.Rules.std_date").alias("d"),
        F.col("created_ts.Rules.std_datetime").alias("dt"),
    ).collect()
    assert rows[0]["u"] == "seconds" and rows[0]["d"] == "2023-11-14"
    assert rows[0]["dt"] == "2023-11-14 22:13:20 UTC"
    assert rows[1]["u"] == "milliseconds" and rows[1]["d"] == "2023-11-14"
    assert rows[2]["u"] is None  # 1998 < range gate
    assert rows[3]["u"] is None  # bad length


def test_unix_timestamp_non_utc_session(spark):
    """F8 must render true UTC even when the session timezone isn't UTC
    (the ' UTC' label must not lie on externally created sessions)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        df = spark.createDataFrame([("1700000000",)], ["created_ts"])
        row = enhanced(df).select(
            F.col("created_ts.Rules.std_date").alias("d"),
            F.col("created_ts.Rules.std_datetime").alias("dt"),
        ).collect()[0]
        assert row["d"] == "2023-11-14"
        assert row["dt"] == "2023-11-14 22:13:20 UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_string_length_and_flat(spark):
    df = spark.createDataFrame([("Café", "x")], ["name", "other"])
    flat = enhanced_flat(df)
    row = flat.collect()[0]
    assert row["name.Rules.string_length"] == 4  # chars not bytes
    assert row["name.HU"] == "Aaaa"
    assert row["name.LU"] == "Aa"
    assert row["other.raw"] == "x"


def test_quote_stripping(spark):
    # JSON-quoted values: rules act on the quote-stripped raw (assertions.rs:186)
    df = spark.createDataFrame([('"2015-12-31"',)], ["date_col"])
    assert _one(enhanced(df), "date_col", "Rules", "std_date") == "2015-12-31"
