"""Text-analysis operator semantics."""

from __future__ import annotations

import pytest

from airflow_crypto_btc_spark.operators.text import (
    fingerprints,
    lang_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "le chat est dans la maison et le jardin"),
        (2, "der hund und die katze das ist gut"),
        (3, "xyzzy plugh qwerty"),          # no stopwords → unknown
        (4, "word word word word word"),    # degenerate repetition
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(docs):
    r = {x["doc_id"]: x for x in token_stats(docs).collect()}
    assert r[0]["n_tokens"] == 6
    assert r[0]["n_uniq_tokens"] == 5  # 'the' twice
    assert r[0]["n_bpe_tokens"] == 6
    assert r[4]["n_uniq_tokens"] == 1
    assert r[0]["avg_token_len"] == pytest.approx(17 / 6, abs=1e-6)


def test_lang_id(docs):
    r = {x["doc_id"]: x["lang_pred"] for x in lang_id(docs).collect()}
    assert r[0] == "en"
    assert r[1] == "fr"
    assert r[2] == "de"
    assert r[3] == "unknown"


def test_lang_id_han_fast_path(spark):
    df = spark.createDataFrame([(0, "你好 世界")], "doc_id long, text string")
    assert lang_id(df).collect()[0]["lang_pred"] == "zh"


def test_quality_score_ordering(docs):
    r = {x["doc_id"]: x["quality"] for x in quality_score(docs).collect()}
    # real English sentence beats both no-stopword and degenerate docs
    assert r[0] > r[3]
    assert r[0] > r[4]
    assert all(0.0 <= v <= 1.0 for v in r.values())


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "ALPHA   beta gamma"),   # normalizes to same content
            (2, "gamma beta alpha"),     # same bag, different order
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in fingerprints(df).collect()}
    assert r[0]["fp_md5"] == r[1]["fp_md5"]
    assert r[0]["fp_rolling"] != r[2]["fp_rolling"]  # order-sensitive
    assert r[0]["fp_md5"] != r[2]["fp_md5"]


def test_approx_distinct_tokens_bounds(spark, sf_dir):
    """HLL estimate stays within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from airflow_crypto_btc_spark.functions.hashing import tokens_expr
    from airflow_crypto_btc_spark.plans.registry_ext import (
        q_approx_distinct_tokens,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    approx = {
        r["source"]: r["approx_uniq_tokens"]
        for r in q_approx_distinct_tokens(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        r["source"]: r["exact"]
        for r in docs.select(
            "source", F.explode(tokens_expr("text")).alias("token")
        )
        .groupBy("source")
        .agg(F.countDistinct("token").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for src in exact:
        assert abs(approx[src] - exact[src]) / exact[src] < 0.05


def test_train_test_split_is_stable_and_proportional(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.text import train_test_split
    from airflow_crypto_btc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in train_test_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_test_split(docs.repartition(7)).collect()
    }
    assert a == b  # partitioning-independent assignment
    test_frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.03 < test_frac < 0.2  # ~10% ± hash noise at 500 docs
