"""Property-based tests (hypothesis): algebraic contracts that must hold
on ARBITRARY inputs, not just the curated fixtures — the merge algebra,
kernel parity across execution engines, and cross-algorithm equality of
the connected-components implementations.

Spark jobs per example are expensive, so each property runs a small
number of generated examples (deadline disabled; the default 100-example
profile would take minutes per property).  The generators aim at the
known hard spots: tied timestamps, unicode/whitespace edge cases, empty
documents, self-loops and long chains.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --------------------------------------------------------------- OHLC merge

_events = st.lists(
    st.tuples(
        st.sampled_from(["purchase", "view"]),
        st.integers(min_value=0, max_value=72),  # hour offset: forces ties
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_events, cut=st.integers(min_value=0, max_value=72))
@settings(**_SETTINGS)
def test_ohlc_merge_equals_recompute_on_random_events(spark, rows, cut):
    """merge(state(x), state(y)) == state(x ∪ y) for EVERY split of every
    event multiset — including duplicate rows and tied boundary
    timestamps (hour-granularity offsets make ties common)."""
    from airflow_crypto_btc_spark.operators.incremental import (
        merge_ohlc_states,
        ohlc_state,
        state_to_ohlc,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (etype, base + dt.timedelta(hours=h), v) for etype, h, v in rows
    ]
    schema = "event_type string, ts timestamp, value double"
    df = spark.createDataFrame(data, schema)
    a = df.filter(f"hour(ts) + (dayofmonth(ts) - 1) * 24 < {cut}")
    b = df.filter(f"hour(ts) + (dayofmonth(ts) - 1) * 24 >= {cut}")
    merged = state_to_ohlc(merge_ohlc_states(ohlc_state(a), ohlc_state(b)))
    full = state_to_ohlc(ohlc_state(df))

    def rows_of(d):
        return sorted(
            (r["event_type"], str(r["date"]), r["open"], r["high"],
             r["low"], r["close"], r["n_obs"])
            for r in d.collect()
        )

    assert rows_of(merged) == rows_of(full)


# ----------------------------------------------------------- kernel parity

# whitespace zoo: ASCII ws (split points for BOTH engines) + unicode ws
# (U+00A0 NBSP, U+3000 ideographic space — split by Python \s but NOT by
# Java \s, the documented tokenization trap) + CJK and accented text
_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("abc ABC\t\n 　日本語éü0123.")
        ),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@given(texts=_texts)
@settings(**_SETTINGS)
def test_minhash_kernels_agree_on_arbitrary_text(spark, texts):
    """The Arrow prep kernel and the HOF expression kernel must emit
    identical (band_keys, set_size) for ANY document — the tokenizer
    parity (Java \\s vs Python \\s) is exactly what random unicode
    whitespace attacks."""
    from pyspark.sql import functions as F

    from airflow_crypto_btc_spark.functions.hashing import (
        minhash_signature_expr,
    )
    from airflow_crypto_btc_spark.operators.dedup import with_shingle_sets
    from airflow_crypto_btc_spark.operators.dedup_fast import (
        minhash_prep_fast,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    hof = (
        with_shingle_sets(df)
        .withColumn("sig", minhash_signature_expr("shingle_set", 12))
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(0, 3), b -> "
                "md5(array_join(slice(sig, b * 3 + 1, 3), '')))"
            ).alias("band_keys"),
            F.col("set_size").cast("long").alias("set_size"),
        )
    )
    fast = minhash_prep_fast(df).select(
        F.col("id").alias("doc_id"), "band_keys", "set_size"
    )
    lhs = {r["doc_id"]: (r["band_keys"], r["set_size"])
           for r in hof.collect()}
    rhs = {r["doc_id"]: (r["band_keys"], r["set_size"])
           for r in fast.collect()}
    assert lhs == rhs


@given(texts=_texts)
@settings(**_SETTINGS)
def test_simhash_twin_agrees_on_arbitrary_text(spark, texts):
    from airflow_crypto_btc_spark.operators.dedup import (
        simhash_fingerprints,
    )
    from airflow_crypto_btc_spark.operators.dedup_fast import (
        simhash_fingerprints_fast,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    lhs = {r["doc_id"]: r["simhash"]
           for r in simhash_fingerprints(df).collect()}
    rhs = {r["doc_id"]: r["simhash"]
           for r in simhash_fingerprints_fast(df).collect()}
    assert lhs == rhs


# ----------------------------------------------------- connected components

_graphs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=0,
    max_size=25,
)


@given(edges=_graphs)
@settings(**_SETTINGS)
def test_cc_algorithms_agree_on_random_graphs(spark, edges):
    """label propagation and two-star must produce identical min-id
    labelings on arbitrary graphs (self-loops, duplicate and reversed
    edges included) — and both must equal a driver-side union-find."""
    from airflow_crypto_btc_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([(i,) for i in range(31)], "doc_id long")
    pairs = spark.createDataFrame(
        edges or [(0, 0)], "id_a long, id_b long"
    )

    # reference: union-find on the driver
    parent = list(range(31))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in (edges or [(0, 0)]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(31)}

    for algo in ("label_prop", "two_star"):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in near_dup_clusters(
                docs, pairs, algorithm=algo
            ).collect()
        }
        assert got == want, algo
