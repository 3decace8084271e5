"""Text analysis + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from shopify_etl_spark.operators import multimodal, text
from shopify_etl_spark.plans.catalog import load_table


def test_quality_metrics_hand_computed(spark):
    df = spark.createDataFrame([(1, "the cat, sat of a mat!")], ["doc_id", "text"])
    r = text.quality_metrics(df).collect()[0]
    assert r.n_tokens == 6
    assert r.n_word_chars == len("thecat,satofamat!")
    assert r.stopword_ratio == round(3 / 6, 4)  # the, of, a
    assert r.n_punct == 2  # ',' and '!'


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is here"),
            (2, "der hund und die katze ist das haus"),
            (3, "xyzzy plugh"),  # no markers → tie → lexicographically first
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.pred_lang for r in text.lang_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "de"  # deterministic tie-break (first of sorted langs)


def test_multimodal_feature_parity_with_jvm(spark, sf_dir):
    """The Pandas-UDF byte stats must agree with JVM-side expressions."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    assets = multimodal.assets_from_documents(docs)
    feats = {r.asset_id: r for r in multimodal.decode_features(assets, fake=True).collect()}
    jvm = {
        r.asset_id: r
        for r in assets.select(
            "asset_id",
            F.length("payload").alias("n_bytes"),
            F.col("meta.n_bytes").alias("meta_bytes"),
        ).collect()
    }
    assert set(feats) == set(jvm)
    for aid, fr in feats.items():
        assert fr.n_bytes == jvm[aid].n_bytes == jvm[aid].meta_bytes
        assert fr.byte_mean == fr.byte_sum // max(fr.n_bytes, 1)
        assert fr.modality == "image"


def test_multimodal_real_decode_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    assets = multimodal.assets_from_documents(docs)
    with pytest.raises(Exception, match="NotImplementedError|media codecs"):
        multimodal.decode_features(assets, fake=False).collect()


def test_token_count(spark):
    df = spark.createDataFrame([(1, "a  b c"), (2, "")], ["doc_id", "text"])
    out = {r.doc_id: r.n for r in df.select("doc_id", text.token_count("text").alias("n")).collect()}
    assert out == {1: 3, 2: 0}
