"""Scalar function edge cases (SURVEY §2.4 F1-F10 null/garbage semantics)."""

from pyspark.sql import functions as F

from shopify_etl_spark.functions import (
    bool_str,
    clean_id,
    get_money,
    non_empty,
    norm_sku,
    safe_num,
    strip_hash,
    tags_csv,
)


def _one(spark, col, schema="v string"):
    """Evaluate a Column over a bunch of test values."""

    def run(values, schema=schema):
        df = spark.createDataFrame([(v,) for v in values], schema)
        return [r.out for r in df.select(col.alias("out")).collect()]

    return run


def test_clean_id(spark):
    run = _one(spark, clean_id(F.col("v"), "R-"))
    assert run(["gid://shopify/Order/123", "plain", None]) == ["R-123", "R-plain", None]


def test_safe_num(spark):
    run = _one(spark, safe_num(F.col("v"), "double", 0.0))
    assert run(["1.5", "garbage", None, ""]) == [1.5, 0.0, 0.0, 0.0]
    run_int = _one(spark, safe_num(F.col("v"), "int", 0))
    assert run_int(["7", "x", None]) == [7, 0, 0]


def test_get_money_shapes(spark):
    df = spark.createDataFrame(
        [({"shopMoney": {"amount": "12.50", "currencyCode": "USD"}},),
         ({"shopMoney": None},), (None,)],
        "v struct<shopMoney: struct<amount string, currencyCode string>>",
    )
    out = [r.out for r in df.select(get_money(F.col("v")).alias("out")).collect()]
    assert out == [12.5, 0.0, 0.0]  # missing/null money → typed default


def test_tags_csv(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), ([],), (None,)], "v array<string>"
    )
    out = [r.out for r in df.select(tags_csv(F.col("v")).alias("out")).collect()]
    assert out == ["a,b", "", ""]


def test_bool_str_python_parity(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "v boolean")
    out = [r.out for r in df.select(bool_str(F.col("v")).alias("out")).collect()]
    assert out == ["True", "False", "None"]  # str(bool) parity, not 'true'/'false'


def test_sku_normalization_and_filter(spark):
    run = _one(spark, norm_sku(F.col("v")))
    assert run([" sku-1 ", "AbC"]) == ["SKU-1", "ABC"]
    df = spark.createDataFrame([("ok",), ("",), ("   ",), (None,)], "v string")
    kept = [r.v for r in df.filter(non_empty(F.col("v"))).collect()]
    assert kept == ["ok"]


def test_strip_hash(spark):
    run = _one(spark, strip_hash(F.col("v")))
    assert run(["#1001", "1001"]) == ["1001", "1001"]
