"""Streaming cross-corpus novelty guard: maintain the bloom-pruned
membership state of ``operators/bloom`` ON a stream.

Per micro-batch of candidate documents:

1. hash the batch (JVM xxhash64 lanes, same as the batch operator) and
   test it against the PERSISTED bloom bitmap — rows the bloom clears
   are definitely new and skip the join;
2. the possibly-seen remainder anti-joins the committed digests table
   (exact verification — bloom false positives die here, so the novel
   set is EXACT);
3. commit, in order: novel digests appended to the digests table, the
   novel rows appended to the output table, then the bitmap row
   overwritten with the OR of the old bitmap and the batch's novel
   digests.  Bloom union IS bitwise OR, which is what makes the filter
   incrementally maintainable with a fixed-size rewrite per batch.

Crash safety: appends are txn-id idempotent; the bitmap overwrite is a
pure OR (re-running it is a no-op), and a LOST bitmap update only makes
the next batch's pre-filter weaker — more suspects reach the exact
anti-join, output unchanged.  The bloom is perf state, never truth.

Scale shape per batch: one Arrow scan of the batch, an anti-join whose
probe side is |suspects| (≈ |true dups| + fp·|new|), and a fixed-size
(n_bits/8 bytes) bitmap rewrite — an ever-growing corpus never joins
against itself.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airflow_crypto_btc_spark.sources.snapshot_table import (
    append,
    current_snapshot,
    overwrite,
    read_snapshot,
    vacuum,
)


def novelty_sink(
    digests_table: str,
    novel_table: str,
    bloom_table: str,
    query_name: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 1 << 20,
    k: int = 5,
):
    """``foreachBatch`` callback; emits each distinct content exactly
    once — in the micro-batch where it first arrives."""
    import numpy as np

    from airflow_crypto_btc_spark.operators.bloom import (
        _NORMALIZED,
        _digest_cols,
    )

    def _read_or_none(spark, table):
        try:
            return read_snapshot(spark, table)
        except ValueError:
            return None

    def _batch_bitmap(rows) -> bytes:
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        if rows:
            h1 = np.array([r["_h1"] for r in rows], np.int64).astype(
                np.uint64
            )
            h2 = np.array([r["_h2"] for r in rows], np.int64).astype(
                np.uint64
            )
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                np.bitwise_or.at(
                    bm,
                    (pos >> np.uint64(3)).astype(np.int64),
                    np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
                )
        return bm.tobytes()

    def _fold(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # within-batch dedup by CONTENT (min id per digest — replays
        # pick the same representative)
        prepped = _digest_cols(batch_df, text_col).withColumn(
            "digest", F.expr(f"md5({_NORMALIZED.format(col=text_col)})")
        )
        w = Window.partitionBy("digest").orderBy(F.col(id_col))
        batch = (
            prepped.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .select(
                F.col(id_col).alias("id"), "digest", "_h1", "_h2"
            )
            .localCheckpoint(eager=False)
        )
        bloom_state = _read_or_none(spark, bloom_table)
        meta = current_snapshot(bloom_table).meta if bloom_state is not None else {}
        if meta and (meta.get("n_bits"), meta.get("k")) != (n_bits, k):
            raise ValueError(
                f"bloom state has (n_bits, k)=({meta.get('n_bits')}, "
                f"{meta.get('k')}), sink configured ({n_bits}, {k}) — "
                "positions would not line up; rebuild the state"
            )
        if bloom_state is None:
            suspects = batch
            certain = batch.limit(0)
        else:
            import pandas as pd

            bitmap_b = bloom_state.collect()[0]["bm"]
            bc = spark.sparkContext.broadcast(bitmap_b)

            def _maybe(batches):
                bitmap = np.frombuffer(bc.value, dtype=np.uint8)
                for pdf in batches:
                    if pdf.empty:
                        continue
                    h1 = pdf["_h1"].to_numpy(np.int64).astype(np.uint64)
                    h2 = pdf["_h2"].to_numpy(np.int64).astype(np.uint64)
                    hit = np.ones(len(pdf), dtype=bool)
                    for i in range(k):
                        pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                        byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
                        hit &= (
                            (byte >> (pos & np.uint64(7)).astype(np.uint8))
                            & 1
                        ).astype(bool)
                    yield pd.DataFrame({"id": pdf["id"], "m": hit})

            flags = batch.select("id", "_h1", "_h2").mapInPandas(
                _maybe, schema="id long, m boolean"
            )
            suspects = batch.join(
                flags.filter("m").select("id"), "id", "left_semi"
            )
            certain = batch.join(
                flags.filter("m").select("id"), "id", "left_anti"
            )
        committed = _read_or_none(spark, digests_table)
        if committed is None:
            verified = suspects
        else:
            verified = suspects.join(
                committed.select("digest"), "digest", "left_anti"
            )
        novel = certain.unionByName(verified).localCheckpoint(
            eager=False
        )
        rows = novel.select("_h1", "_h2").collect()
        append(
            spark, novel.select("digest"), digests_table,
            txn_id=f"{query_name}:{batch_id}:digests",
        )
        append(
            spark, novel.select("id", "digest"), novel_table,
            txn_id=f"{query_name}:{batch_id}:novel",
        )
        # bitmap last: an OR is idempotent under replay, and a lost
        # update only weakens the NEXT batch's pre-filter
        delta_bm = np.frombuffer(_batch_bitmap(rows), dtype=np.uint8)
        if bloom_state is not None:
            delta_bm = delta_bm | np.frombuffer(
                bloom_state.collect()[0]["bm"], dtype=np.uint8
            )
        overwrite(
            spark,
            spark.createDataFrame(
                [(bytearray(delta_bm.tobytes()),)], "bm binary"
            ),
            bloom_table,
            meta={"n_bits": n_bits, "k": k},
        )
        # every overwrite de-references the previous bitmap part but
        # leaves it on disk; without this an N-batch run accumulates N
        # dead copies of the (fixed-size) state
        vacuum(bloom_table)

    return _fold
