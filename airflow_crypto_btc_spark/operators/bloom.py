"""Bloom-pruned cross-corpus novelty — the membership primitive a
training pipeline uses to ask "which of today's documents has the
historical corpus never seen?" without shuffling the historical corpus.

Spark 4 does not register ``bloom_filter_agg`` for user SQL, so the
filter is built here from first principles, Spark-first:

- the two hash lanes are ``xxhash64(digest, seed)`` — computed JVM-side,
  so the corpus scan stays in whole-stage codegen;
- per-Arrow-batch kernels OR positions ``(h1 + i·h2) mod n_bits``
  (classic double hashing, Kirsch–Mitzenmacher) into a fixed-size
  bitmap; partial bitmaps (one per batch, ``n_bits/8`` bytes) are OR'd
  on the driver — the reduction payload is #batches × filter size,
  never row count;
- serving broadcasts the final bitmap and tests all ``k`` bits per
  incoming row vectorized in numpy.

The bloom is a PRE-FILTER only: rows whose bits are not all set are
*definitely* new (no false negatives by construction) and skip the
join entirely; only the "possibly seen" remainder — |incoming| ×
fp_rate of the truly-new rows, plus the true duplicates — goes through
the exact anti-join.  The final output is therefore EXACT (DuckDB
replays it as a plain anti-join), while the expensive join's probe side
shrinks from |incoming| to roughly |duplicates|.  At 100 TB the
historical side contributes only digests to the build scan and the
bitmap (megabytes) to the serve path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: normalization shared with operators/dedup.exact_dedup — novelty is
#: defined on the same content identity exact dedup uses
_NORMALIZED = "lower(trim(regexp_replace({col}, '\\\\s+', ' ')))"


def _digest_cols(df: DataFrame, text_col: str) -> DataFrame:
    digest = F.expr(f"md5({_NORMALIZED.format(col=text_col)})")
    return df.withColumn("_h1", F.xxhash64(digest)).withColumn(
        "_h2",
        # distinct lane: seed the second hash by a marker prefix (the
        # JVM expression reuses the same codegen'd digest)
        F.xxhash64(F.concat(F.lit("b:"), digest)),
    )


def build_digest_bloom(
    corpus: DataFrame,
    text_col: str = "text",
    n_bits: int = 1 << 20,
    k: int = 5,
) -> bytes:
    """One scan of the corpus → a ``n_bits``-wide bloom bitmap (driver
    bytes, size ``n_bits/8`` regardless of corpus size — that fixed
    bound is the whole point).  ``n_bits`` should be ~10 bits per
    expected distinct document for ~1% false positives at k=5."""
    import numpy as np
    import pandas as pd

    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")

    def _partial(batches):
        bitmap = np.zeros(n_bits // 8, dtype=np.uint8)
        touched = False
        for pdf in batches:
            if pdf.empty:
                continue
            touched = True
            h1 = pdf["_h1"].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf["_h2"].to_numpy(dtype=np.int64).astype(np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                np.bitwise_or.at(
                    bitmap, (pos >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                )
        if touched:
            yield pd.DataFrame({"bm": [bitmap.tobytes()]})

    partials = (
        _digest_cols(corpus, text_col)
        .select("_h1", "_h2")
        .mapInPandas(_partial, schema="bm binary")
        .collect()
    )
    import numpy as np

    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def novel_documents(
    corpus: DataFrame,
    incoming: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT set of ``incoming`` rows whose normalized content never
    appears in ``corpus`` — bloom-pruned: definitely-new rows (bloom
    miss) bypass the join, only possibly-seen rows are anti-joined
    against the corpus digests.  Returns (id, is_bloom_certain) where
    ``is_bloom_certain`` marks rows the bloom alone cleared — the
    observability column that shows how much join work the filter
    saved."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    bitmap_b = build_digest_bloom(corpus, text_col, n_bits, k)
    bc = spark.sparkContext.broadcast(bitmap_b)

    def _maybe(batches):
        bitmap = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if pdf.empty:
                continue
            h1 = pdf["_h1"].to_numpy(dtype=np.int64).astype(np.uint64)
            h2 = pdf["_h2"].to_numpy(dtype=np.int64).astype(np.uint64)
            hit = np.ones(len(pdf), dtype=bool)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
                bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
                hit &= bit.astype(bool)
            yield pd.DataFrame(
                {"id": pdf["id"], "maybe_seen": hit}
            )

    inc = _digest_cols(incoming, text_col).select(
        F.col(id_col).alias("id"),
        F.expr(f"md5({_NORMALIZED.format(col=text_col)})").alias(
            "digest"
        ),
        "_h1",
        "_h2",
    ).localCheckpoint(eager=False)  # one digest pass feeds both branches
    flags = inc.select("id", "_h1", "_h2").mapInPandas(
        _maybe, schema="id long, maybe_seen boolean"
    )
    certain_new = flags.filter(~F.col("maybe_seen")).select("id")
    suspects = inc.join(
        flags.filter(F.col("maybe_seen")).select("id"), "id", "left_semi"
    )
    corpus_digests = corpus.select(
        F.expr(f"md5({_NORMALIZED.format(col=text_col)})").alias("digest")
    ).distinct()
    verified_new = suspects.join(
        corpus_digests, "digest", "left_anti"
    ).select("id")
    return certain_new.withColumn(
        "is_bloom_certain", F.lit(True)
    ).unionByName(
        verified_new.withColumn("is_bloom_certain", F.lit(False))
    )
