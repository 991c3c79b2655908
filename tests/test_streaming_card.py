"""Streaming data-card facts maintainer: the served card equals the
batch card over everything that arrived, re-delivery and replay fold
nothing, and compaction keeps the facts table bounded without changing
the card."""

from __future__ import annotations

from airflow_crypto_btc_spark.operators.curation import corpus_data_card
from airflow_crypto_btc_spark.sources.snapshot_table import (
    current_snapshot,
)
from airflow_crypto_btc_spark.streaming.card_stream import (
    card_facts_sink,
    data_card_from_facts_table,
)

EN = "the cat and the dog are in the house with a ball"
FR = "le chat et le chien sont dans la maison avec une balle"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _card(df):
    return {
        r["lang"]: tuple(r)[1:] for r in df.collect()
    }


def test_streaming_card_matches_batch_across_batches(spark, tmp_path):
    ft = str(tmp_path / "facts")
    sink = card_facts_sink(ft, query_name="card")
    b0 = [(1, EN), (2, EN), (3, FR)]
    b1 = [(4, EN + " x"), (5, "qqq zzz")]
    sink(_docs(spark, b0), 0)
    # mid-stream card: exact over the prefix, including dup accounting
    assert _card(data_card_from_facts_table(spark, ft)) == _card(
        corpus_data_card(_docs(spark, b0))
    )
    sink(_docs(spark, b1), 1)
    assert _card(data_card_from_facts_table(spark, ft)) == _card(
        corpus_data_card(_docs(spark, b0 + b1))
    )


def test_streaming_card_replay_and_redelivery_fold_nothing(
    spark, tmp_path
):
    ft = str(tmp_path / "facts")
    sink = card_facts_sink(ft, query_name="card")
    sink(_docs(spark, [(1, EN), (2, FR)]), 0)
    v = current_snapshot(ft).version
    # crash-replay of the same batch id: txn-id idempotent, no commit
    sink(_docs(spark, [(1, EN), (2, FR)]), 0)
    assert current_snapshot(ft).version == v
    # re-delivery under a NEW batch id: ids anti-join away; a mutated
    # body under a seen id is append-ignore, not a re-score
    sink(_docs(spark, [(2, FR + " encore"), (3, EN)]), 1)
    card = _card(data_card_from_facts_table(spark, ft))
    want = _card(corpus_data_card(_docs(spark, [(1, EN), (2, FR), (3, EN)])))
    assert card == want


def test_streaming_card_compaction_bounds_without_drift(spark, tmp_path):
    ft = str(tmp_path / "facts")
    sink = card_facts_sink(
        ft, query_name="card", compact_every=3, compact_target_parts=2
    )
    rows = []
    for i in range(6):
        batch = [(10 * i + j, EN if j % 2 else FR) for j in range(3)]
        rows += batch
        sink(_docs(spark, batch), i)
    assert len(current_snapshot(ft).files) <= 4
    assert _card(data_card_from_facts_table(spark, ft)) == _card(
        corpus_data_card(_docs(spark, rows))
    )
