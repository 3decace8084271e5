"""PII scrubbing tests: pseudonym stability, regex redaction, banding."""

from shopify_etl_spark.operators import privacy


def test_pseudonym_stable_and_salted(spark):
    df = spark.createDataFrame([("alice",), ("bob",), ("alice",)], ["name"])
    out = [r.p for r in df.select(privacy.pseudonym("name").alias("p")).collect()]
    assert out[0] == out[2] != out[1]  # stable per value
    assert all(p.startswith("anon-") and len(p) == 5 + 12 for p in out)
    other = [
        r.p
        for r in df.select(privacy.pseudonym("name", salt="s2").alias("p")).collect()
    ]
    assert out[0] != other[0]  # salt changes the mapping


def test_mask_email_phone_digits(spark):
    df = spark.createDataFrame(
        [("reach me at jo.doe+x@mail.example.com or 020-7946-0958 room 12",)],
        ["t"],
    )
    r = df.select(
        privacy.mask_pattern("t", privacy.EMAIL, "[EMAIL]").alias("e"),
        privacy.mask_pattern("t", privacy.PHONEISH, "[PHONE]").alias("p"),
        privacy.mask_pattern("t").alias("d"),
    ).collect()[0]
    assert r.e == "reach me at [EMAIL] or 020-7946-0958 room 12"
    assert r.p == "reach me at jo.doe+x@mail.example.com or [PHONE] room 12"
    assert "12" not in r.d and "0958" not in r.d


def test_generalize_numeric_bands_negatives_down(spark):
    df = spark.createDataFrame([(2547.4,), (-0.5,), (999.99,)], ["v"])
    got = [r.b for r in df.select(privacy.generalize_numeric("v", 1000).alias("b")).collect()]
    assert got == [2000, -1000, 0]


def test_scrub_composes(spark):
    df = spark.createDataFrame([(1, "Customer#000000042", 1863.84)], ["k", "n", "bal"])
    r = privacy.scrub(
        df, pseudonym_cols=["n"], band_cols={"bal": 500}
    ).collect()[0]
    assert r.n.startswith("anon-") and r.bal == 1500 and r.k == 1
