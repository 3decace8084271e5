"""Interchange-format round-trip contracts (sources/formats.py):
value parity through ORC/JSONL/CSV against the parquet truth, loud
failure where a format can't represent the data."""

import pytest

from shopify_etl_spark.sources.formats import read_table, write_table

SF = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def lineitem(spark):
    # decimals, dates, strings — the type surface vendor drops mangle
    return spark.read.parquet(f"{SF}/lineitem.parquet").limit(200).cache()


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_flat_table_roundtrip_value_parity(spark, tmp_path, lineitem, fmt):
    path = str(tmp_path / f"li_{fmt}")
    write_table(lineitem, path, fmt)
    back = read_table(spark, path, fmt, schema=lineitem.schema)
    assert back.schema == lineitem.schema
    assert _canon(back) == _canon(lineitem)


def test_orc_preserves_arrays(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    path = str(tmp_path / "emb_orc")
    write_table(emb, path, "orc")
    back = read_table(spark, path, "orc")
    assert back.schema == emb.schema
    assert _canon(back) == _canon(emb)


def test_json_arrays_need_schema_and_match(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    path = str(tmp_path / "emb_json")
    write_table(emb, path, "json")
    back = read_table(spark, path, "json", schema=emb.schema)
    assert _canon(back) == _canon(emb)


def test_csv_rejects_complex_types(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(5)
    with pytest.raises(Exception, match="(?i)csv.*(array|support)"):
        write_table(emb, str(tmp_path / "emb_csv"), "csv")


def test_schema_on_read_requires_schema(spark, tmp_path, lineitem):
    path = str(tmp_path / "li_csv2")
    write_table(lineitem, path, "csv")
    with pytest.raises(ValueError, match="schema-on-read"):
        read_table(spark, path, "csv")


def test_unknown_format_rejected(spark, lineitem, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(lineitem, str(tmp_path / "x"), "avro")


class TestSchemaEvolution:
    def test_added_column_reads_null_for_old_files(self, spark, tmp_path):
        from shopify_etl_spark.sources.formats import read_evolving

        p = str(tmp_path / "evolving")
        spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
            f"{p}/batch=1"
        )
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, name string, score double"
        ).write.parquet(f"{p}/batch=2")
        out = read_evolving(spark, p)
        assert set(out.columns) >= {"id", "name", "score"}
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["score"] is None  # retroactively nullable
        assert rows[2]["score"] == 9.5

    def test_type_change_fails_loudly(self, spark, tmp_path):
        from shopify_etl_spark.sources.formats import read_evolving

        p = str(tmp_path / "conflict")
        spark.createDataFrame([(1, 10)], "id long, v long").write.parquet(
            f"{p}/batch=1"
        )
        spark.createDataFrame([(2, "ten")], "id long, v string").write.parquet(
            f"{p}/batch=2"
        )
        with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
            read_evolving(spark, p).collect()
