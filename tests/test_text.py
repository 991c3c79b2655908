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

    got = {
        r["source"]: r
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
    assert set(got) == set(exact)
    for src in exact:
        # the entry hashes the envelope boolean; pin it here too, plus
        # that the exact side the envelope anchors on is truly exact
        assert got[src]["n_uniq_exact"] == exact[src]
        assert got[src]["approx_within_5pct"] is True


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


# ------------------------- repetition signals & PMI (round-2 curation wave)


def test_repetition_scores_hand_computed(spark):
    from airflow_crypto_btc_spark.operators.text import repetition_scores

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # top a=3/4; types 2/4; bigrams: aa aa ab → dup 1/3
            (2, "x y"),              # no repetition; 1 bigram, 0 dup
            (3, "z"),                # single token: 0 bigrams → null frac
            (4, "   "),              # tokenless: excluded
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_scores(docs).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["n_tokens"] == 4 and got[1]["n_types"] == 2
    assert got[1]["top_token_frac"] == 0.75
    assert got[1]["dup_bigram_frac"] == round(1 - 2 / 3, 6)
    assert got[2]["dup_bigram_frac"] == 0.0
    assert got[3]["dup_bigram_frac"] is None
    assert got[3]["top_token_frac"] == 1.0


def test_bigram_pmi_hand_computed(spark):
    import math

    from airflow_crypto_btc_spark.operators.text import bigram_pmi

    # "u v" appears 3 times; fillers are distinct so only "u v" clears min_count
    docs = spark.createDataFrame(
        [(i, "u v") for i in range(3)] + [(10, "p q r")],
        "doc_id long, text string",
    )
    out = bigram_pmi(docs, min_count=3, top_k=5).collect()
    assert len(out) == 1
    row = out[0]
    assert row["bigram"] == "u v"
    nu, nb = 9.0, 5.0  # 9 unigrams, 5 bigrams
    expect = math.log((3 * nu * nu) / (nb * 3 * 3))
    assert row["pmi"] == round(expect, 6)


def test_repetition_and_pmi_stay_jvm_side(spark, sf_dir):
    from airflow_crypto_btc_spark.plans.registry_curation import (
        q_text_bigram_pmi,
        q_text_repetition_score,
    )

    for fn in (q_text_repetition_score, q_text_bigram_pmi):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
    # vocabulary joins must be broadcast, not shuffled
    plan = q_text_bigram_pmi(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_scrub_pii_masks_and_counts(spark):
    from airflow_crypto_btc_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "contact jane.doe+x@example.co.uk or call +1-555-123-4567"),
            (2, "server at 192.168.0.1 leaked account 123456789012"),
            (3, "clean text with the number 42 and nothing sensitive"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    r1 = out[1]
    assert "<EMAIL>" in r1["clean_text"] and "<PHONE>" in r1["clean_text"]
    assert "jane" not in r1["clean_text"] and "555" not in r1["clean_text"]
    assert (r1["n_emails"], r1["n_phones"]) == (1, 1)
    r2 = out[2]
    assert "<IP>" in r2["clean_text"] and "<ID>" in r2["clean_text"]
    assert (r2["n_ips"], r2["n_ids"]) == (1, 1)
    r3 = out[3]
    assert r3["clean_text"].endswith("42 and nothing sensitive")
    assert (r3["n_emails"], r3["n_phones"], r3["n_ips"], r3["n_ids"]) == (
        0, 0, 0, 0,
    )


def test_dup_span_scrub_removes_cross_doc_spans_only(spark):
    """Lee-et-al ExactSubstr semantics: tokens covered by a k-gram in
    ≥2 distinct docs vanish from EVERY doc; within-doc repetition and
    unique text survive; a fully-duplicated doc emits an empty
    clean_text row; untouched docs come back token-normalized."""
    from airflow_crypto_btc_spark.operators.text import dup_span_scrub

    shared = "one two three four five six seven eight"  # exactly k=8
    rows = [
        (1, f"alpha {shared} beta"),
        (2, f"{shared} gamma delta"),
        (3, shared),                       # fully duplicated
        (4, "totally unique text with  extra   spaces here"),
        (5, "rep rep rep rep rep rep rep rep rep"),  # within-doc only
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_scrubbed"], r["clean_text"])
        for r in dup_span_scrub(docs).collect()
    }
    assert got[1] == (10, 8, "alpha beta")
    assert got[2] == (10, 8, "gamma delta")
    assert got[3] == (8, 8, "")
    # untouched: normalized whitespace, zero scrubbed
    assert got[4] == (7, 0, "totally unique text with extra spaces here")
    # within-doc 8-gram repetition is NOT cross-doc: survives intact
    assert got[5] == (9, 0, "rep rep rep rep rep rep rep rep rep")


def test_dup_span_scrub_occurrence_mode_cuts_intra_doc_repeats(spark):
    """count_mode='occurrences' is the cited tool's exact semantics:
    a k-gram with >=2 total occurrences is duplicated even when both
    copies live in ONE document — the fixture corpus has no intra-doc
    8-gram repeats, so this planted case pins the mode difference."""
    import pytest as _pytest

    from airflow_crypto_btc_spark.operators.text import dup_span_scrub

    shared = "one two three four five six seven eight"  # exactly k=8
    rows = [
        (1, f"alpha {shared} beta"),
        (2, f"{shared} gamma delta"),
        # 9x 'rep' = two+ overlapping identical 8-grams WITHIN one doc
        (5, "rep rep rep rep rep rep rep rep rep"),
        (6, "clean and fully unique words only"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_scrubbed"], r["clean_text"])
        for r in dup_span_scrub(
            docs, count_mode="occurrences"
        ).collect()
    }
    # cross-doc spans scrub exactly as in documents mode...
    assert got[1] == (10, 8, "alpha beta")
    assert got[2] == (10, 8, "gamma delta")
    # ...AND the intra-doc repeat is now cut (documents mode keeps it)
    assert got[5] == (9, 9, "")
    assert got[6][1] == 0
    with _pytest.raises(ValueError, match="count_mode"):
        dup_span_scrub(docs, count_mode="bogus")


def test_scrub_pii_matches_duckdb_on_real_matches(spark):
    """The fixture corpus has no PII, so the catalog oracle exercises
    the no-op path; THIS test replays the same rule chain in DuckDB on
    text that actually matches, proving the patterns live in the
    Java-regex ∩ RE2 common subset byte-for-byte."""
    import duckdb

    from airflow_crypto_btc_spark.operators.text import (
        PII_RULES,
        scrub_pii,
    )

    rows = [
        (1, "a@b.io and c.d@e.org, dial 555-123-4567 now"),
        (2, "10.0.0.255 vs 999123456789 vs +44-207-946-0958"),
        (3, "no matches at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    names = {"<EMAIL>": "n_emails", "<PHONE>": "n_phones",
             "<IP>": "n_ips", "<ID>": "n_ids"}
    got = {
        (r["doc_id"], r["clean_text"],
         *(r[names[ph]] for ph, _ in PII_RULES))
        for r in scrub_pii(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    sql, prev = [], "text"
    for i, (ph, pat) in enumerate(PII_RULES):
        sql.append(f"len(regexp_extract_all({prev}, '{pat}')) AS c{i}")
        prev = f"regexp_replace({prev}, '{pat}', '{ph}', 'g')"
    want = {
        tuple(r)
        for r in con.execute(
            f"SELECT doc_id, {prev} AS clean_text, "
            f"{', '.join(sql)} FROM d"
        ).fetchall()
    }
    assert got == want


def test_strip_markup(spark):
    from airflow_crypto_btc_spark.operators.text import strip_markup

    docs = spark.createDataFrame(
        [
            (1, "<p>Hello <b>world</b></p>\n\n  spaced\tout"),
            (2, "5 &lt; 7 &amp;&amp; 9 &gt; 3, say &quot;hi&quot;"),
            (3, "&amp;lt; stays escaped-literal"),
            (4, "plain already"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_markup(docs).collect()}
    assert out[1]["clean_text"] == "Hello world spaced out"
    assert out[1]["n_removed"] > 0
    assert out[2]["clean_text"] == '5 < 7 && 9 > 3, say "hi"'
    # amp decodes LAST: &amp;lt; becomes the literal string "&lt;",
    # never resurrecting a decodable entity or a tag
    assert out[3]["clean_text"] == "&lt; stays escaped-literal"
    assert out[4]["clean_text"] == "plain already"
    assert out[4]["n_removed"] == 0


def test_scrub_pii_idempotent(spark):
    """Placeholders contain no digits or @, so re-scrubbing scrubbed
    text is a fixed point — masking can be safely re-run on a corpus
    where some documents were already cleaned."""
    from airflow_crypto_btc_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "a@b.io then 555-123-4567 then 10.0.0.1 then 999888777666"),
            (2, "already <EMAIL> masked <PHONE> here <IP> and <ID>"),
        ],
        "doc_id long, text string",
    )
    once = scrub_pii(docs).selectExpr(
        "doc_id", "clean_text AS text"
    )
    twice = {r["doc_id"]: r for r in scrub_pii(once).collect()}
    first = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    for i in (1, 2):
        assert twice[i]["clean_text"] == first[i]["clean_text"]
        assert (
            twice[i]["n_emails"], twice[i]["n_phones"],
            twice[i]["n_ips"], twice[i]["n_ids"],
        ) == (0, 0, 0, 0)


def test_strip_markup_single_pass_contract(spark):
    """Decoded entities survive the pass that decodes them (tags are
    stripped BEFORE decoding) — and the documented non-idempotency is
    real: a second pass would eat text between decoded angle brackets,
    which is why the operator runs once at ingest."""
    from airflow_crypto_btc_spark.operators.text import strip_markup

    docs = spark.createDataFrame(
        [(1, "<b>x</b> &lt;tag&gt; y")], "doc_id long, text string"
    )
    once = strip_markup(docs).collect()[0]
    assert once["clean_text"] == "x <tag> y"
    again = strip_markup(
        spark.createDataFrame(
            [(1, once["clean_text"])], "doc_id long, text string"
        )
    ).collect()[0]
    assert again["clean_text"] == "x y"  # the non-idempotent bite


def test_scrub_pii_type_priority_and_boundaries(spark):
    """Review-pass pins: an IPv4 with a 3-digit octet must be typed
    <IP>, not <PHONE> (IP rule runs first), and a phone match must not
    swallow its trailing separator."""
    from airflow_crypto_btc_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "server at 192.168.100.1 responded"),
            (2, "call 555-123-4567. then stop"),
            (3, "dial 555-123-4567 now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["clean_text"] == "server at <IP> responded"
    assert (out[1]["n_ips"], out[1]["n_phones"]) == (1, 0)
    assert out[2]["clean_text"] == "call <PHONE>. then stop"
    assert out[3]["clean_text"] == "dial <PHONE> now"


def test_unigram_logprob_ranks_fluent_over_gibberish(spark):
    """The corpus-LM score must rank in-distribution text above
    out-of-distribution gibberish, score empty docs null, and weight
    by the corpus frequencies (common tokens → higher log P)."""
    from airflow_crypto_btc_spark.operators.text import (
        unigram_logprob_score,
    )

    rows = [(i, "the cat sat on the mat near the door") for i in range(8)]
    rows += [(100, "the cat sat near the mat"),       # in-distribution
             (101, "zxqv wklp jjrt mmnb qqwe"),       # gibberish
             (102, "")]                               # empty
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob_score(docs).collect()}
    assert out[100]["mean_logprob"] > out[101]["mean_logprob"]
    assert out[102]["n_tokens"] == 0
    assert out[102]["mean_logprob"] is None
    # 'the' (most frequent) gives a single-token doc the max score
    single = spark.createDataFrame(
        rows + [(200, "the"), (201, "zxqv")], "doc_id long, text string"
    )
    o2 = {r["doc_id"]: r for r in unigram_logprob_score(single).collect()}
    assert o2[200]["mean_logprob"] > o2[201]["mean_logprob"]


# ---------------------------------------------------- persisted text models


def test_text_models_match_inline_on_own_corpus(spark, tmp_path):
    """Scoring the model's own corpus from the persisted artifact must
    equal the inline self-estimate for BOTH models (the from-model
    catalog entries pin the same identity against the DuckDB oracle)."""
    from airflow_crypto_btc_spark.operators.curation import (
        tfidf_top_terms,
    )
    from airflow_crypto_btc_spark.operators.text import (
        build_text_models,
        tfidf_top_terms_from_model,
        unigram_logprob_from_model,
        unigram_logprob_score,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the log"),
            (2, "quantum flux capacitors hum"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    it, ut = str(tmp_path / "idf"), str(tmp_path / "unigram")
    build_text_models(spark, docs, it, ut, source_version="v1")
    got_tfidf = {
        (r["doc_id"], r["rnk"]): (r["token"], r["tf"], r["tfidf"])
        for r in tfidf_top_terms_from_model(
            spark, docs, it, k=2, expect_source="v1"
        ).collect()
    }
    want_tfidf = {
        (r["doc_id"], r["rnk"]): (r["token"], r["tf"], r["tfidf"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert got_tfidf == want_tfidf and got_tfidf
    got_lp = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob_from_model(
            spark, docs, ut, expect_source="v1"
        ).collect()
    }
    want_lp = {
        r["doc_id"]: (r["n_tokens"], r["mean_logprob"])
        for r in unigram_logprob_score(docs).collect()
    }
    assert got_lp == want_lp and got_lp[3] == (0, None)


def test_text_models_oov_floor_and_frozen_scores(spark, tmp_path):
    """Against a FROZEN model, unseen tokens take the add-one floor
    (gibberish scores low) and a document's score cannot drift as other
    documents arrive — the property the inline self-estimate lacks."""
    import math

    from airflow_crypto_btc_spark.operators.text import (
        build_text_models,
        tfidf_top_terms_from_model,
        unigram_logprob_from_model,
    )

    corpus = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    it, ut = str(tmp_path / "idf"), str(tmp_path / "unigram")
    build_text_models(spark, corpus, it, ut, source_version="v1")
    fluent = spark.createDataFrame(
        [(100, "the cat sat")], "doc_id long, text string"
    )
    gibberish = spark.createDataFrame(
        [(101, "zxqv wvvq qqzx")], "doc_id long, text string"
    )
    s_fluent = unigram_logprob_from_model(
        spark, fluent, ut
    ).collect()[0]["mean_logprob"]
    s_gib = unigram_logprob_from_model(
        spark, gibberish, ut
    ).collect()[0]["mean_logprob"]
    # corpus: 60 tokens, 5-token vocab → OOV floor ln(1/65)
    assert s_gib == round(math.log(1 / 65), 6)
    assert s_fluent > s_gib
    # frozen: the same doc scores identically regardless of what else
    # is in the scored batch
    both = {
        r["doc_id"]: r["mean_logprob"]
        for r in unigram_logprob_from_model(
            spark, fluent.unionByName(gibberish), ut
        ).collect()
    }
    assert both == {100: s_fluent, 101: s_gib}
    # OOV idf = smoothed df=0 weight ln(n_docs + 1): the new document's
    # distinctive vocabulary outranks the corpus-common words
    top = tfidf_top_terms_from_model(
        spark,
        spark.createDataFrame(
            [(102, "the cat zxqv")], "doc_id long, text string"
        ),
        it,
        k=1,
    ).collect()[0]
    assert top["token"] == "zxqv"
    assert top["tfidf"] == round(math.log(11), 6)


def test_text_models_staleness_refusal(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.text import (
        build_text_models,
        tfidf_top_terms_from_model,
        unigram_logprob_from_model,
    )

    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    it, ut = str(tmp_path / "idf"), str(tmp_path / "unigram")
    build_text_models(spark, docs, it, ut, source_version="v1")
    with pytest.raises(ValueError, match="stale text model"):
        tfidf_top_terms_from_model(spark, docs, it, expect_source="v2")
    with pytest.raises(ValueError, match="stale text model"):
        unigram_logprob_from_model(spark, docs, ut, expect_source="v2")


def test_dup_ngram_coverage_counts_cross_doc_spans_only(spark):
    """Edge semantics of the duplicated-span detector: a k-gram repeated
    WITHIN one document only is not a duplicate (that is
    repetition_scores' signal); a span shared across two docs marks
    every occurrence position in both; docs shorter than k tokens get
    0 grams and NULL coverage."""
    from airflow_crypto_btc_spark.operators.text import dup_ngram_coverage

    span = "a b c d e f g h"          # one 8-gram
    rows = [
        (1, f"{span} tail1 x y z"),   # shares the span with doc 2
        (2, f"lead {span} q r s"),
        (3, f"{span} mid {span}"),    # 3 copies of positions incl. span twice
        (4, "solo u v w only"),       # no 8 tokens → 0 grams
        (5, " ".join(["rep"] * 20)),  # heavy WITHIN-doc repetition only…
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_coverage"])
        for r in dup_ngram_coverage(df, k=8).collect()
    }
    # doc 4: 4 tokens < 8 → zero grams, NULL coverage
    assert got[4] == (0, 0, None)
    # doc 5: "rep"*20 → 13 grams, all the SAME gram, but only doc 5 has
    # it → zero duplicated positions (within-doc repetition excluded)
    assert got[5] == (13, 0, 0.0)
    # docs 1 and 2 share exactly the one 8-gram "a b c d e f g h"
    assert got[1][1] >= 1 and got[2][1] >= 1
    # doc 3 contains that shared gram too (twice) — both positions count
    assert got[3][1] >= 2
    # coverage is n_dup/n_grams in exact micro-units
    for d in (1, 2, 3):
        n, nd, cov = got[d]
        assert cov == ((2 * nd * 1_000_000 + n) // (2 * n)) / 1_000_000


def test_gram_index_serves_exact_delta_and_refuses_stale(spark, tmp_path):
    """The frozen gram index's delta scoring must equal the one-shot
    full-corpus recompute restricted to delta ids (one corpus
    occurrence + one delta occurrence ≥ 2 distinct docs), and a stale
    index is refused from metadata alone."""
    import pytest as _pytest

    from airflow_crypto_btc_spark.operators.text import (
        build_gram_index,
        dup_coverage_from_index,
        dup_ngram_coverage,
    )

    span = "a b c d e f g h"
    corpus = spark.createDataFrame(
        [(1, f"{span} tail x y z"), (2, "totally different words here "
                                        "one two three four five six")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(10, f"lead {span} q r s"),           # dup vs corpus doc 1
         (11, "novel content w only here a1 a2 a3 a4 a5 a6 a7"),
         (12, "shared-delta p1 p2 p3 p4 p5 p6 p7 p8 end"),
         (13, "shared-delta p1 p2 p3 p4 p5 p6 p7 p8 end2")],  # dup vs 12
        "doc_id long, text string",
    )
    t = str(tmp_path / "grams")
    build_gram_index(spark, corpus, t, source_version="v1")
    got = sorted(
        tuple(r)
        for r in dup_coverage_from_index(
            spark, delta, t, expect_source="v1"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in dup_ngram_coverage(corpus.unionByName(delta))
        .filter("doc_id >= 10")
        .collect()
    )
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[10][2] >= 1   # corpus-shared span found
    assert by_id[11][2] == 0   # novel doc untouched
    assert by_id[12][2] >= 1 and by_id[13][2] >= 1  # delta-internal dup
    with _pytest.raises(ValueError, match="stale gram index"):
        dup_coverage_from_index(spark, delta, t, expect_source="v2")


# -------------------------------------------------------- bigram LM


def test_bigram_scores_word_order(spark):
    from airflow_crypto_btc_spark.operators.text import (
        bigram_logprob_score,
    )

    # "a b" is the dominant pattern; doc 3 uses the same vocabulary in
    # reversed order — the unigram proxy cannot tell, the bigram must
    rows = [(i, "a b a b a b") for i in range(3)] + [(3, "b a b a b a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = {
        x["doc_id"]: x for x in bigram_logprob_score(docs).collect()
    }
    assert r[0]["n_bigrams"] == 5
    assert r[3]["mean_logprob"] < r[0]["mean_logprob"]


def test_bigram_short_docs_score_null(spark):
    from airflow_crypto_btc_spark.operators.text import (
        bigram_logprob_score,
    )

    docs = spark.createDataFrame(
        [(0, "one two three"), (1, "solo"), (2, " ")],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in bigram_logprob_score(docs).collect()}
    assert r[0]["n_bigrams"] == 2
    assert r[1]["n_bigrams"] == 0 and r[1]["mean_logprob"] is None
    assert r[2]["n_bigrams"] == 0 and r[2]["mean_logprob"] is None


def test_bigram_from_model_floor_and_stale_refusal(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.text import (
        bigram_logprob_from_model,
        bigram_logprob_score,
        build_bigram_lm,
    )

    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(4)],
        "doc_id long, text string",
    )
    bt, ut = str(tmp_path / "bi"), str(tmp_path / "uni")
    build_bigram_lm(spark, train, bt, ut, source_version="v1")
    # own corpus: serve == inline (the catalog-oracle identity)
    served = bigram_logprob_from_model(
        spark, train, bt, ut, expect_source="v1"
    )
    inline = bigram_logprob_score(train)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, inline.collect())
    )
    # novel text: unseen pairs take the smoothed floor, score lower
    novel = spark.createDataFrame(
        [(9, "zephyr quartz blimp the cat")], "doc_id long, text string"
    )
    nv = bigram_logprob_from_model(spark, novel, bt, ut).collect()[0]
    base = served.collect()[0]
    assert nv["mean_logprob"] < base["mean_logprob"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stale text model"):
        bigram_logprob_from_model(
            spark, train, bt, ut, expect_source="v2"
        )


def test_vocab_coverage_surfaces_starved_language(spark, tmp_path):
    from airflow_crypto_btc_spark.operators.vocab import (
        build_vocab_table,
        encode_from_vocab,
    )
    from pyspark.sql import functions as F
    from airflow_crypto_btc_spark.functions.hashing import ratio_micro

    # head language dominates the corpus → a small frequency-cut vocab
    # is all-English and the tail language's OOV rate exposes it
    docs = spark.createDataFrame(
        [(i, "en", "alpha beta gamma delta") for i in range(20)]
        + [(100 + i, "xx", "zorp quux blivet frob") for i in range(2)],
        "doc_id long, lang string, text string",
    )
    vt = str(tmp_path / "vocab")
    build_vocab_table(spark, docs, vt, size=4, source_version="v1")
    enc = encode_from_vocab(spark, docs, vt, expect_source="v1")
    cov = {
        r["lang"]: r
        for r in enc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_oov").alias("n_oov"),
        )
        .select(
            "lang", ratio_micro("n_oov", "n_tokens").alias("oov_rate")
        )
        .collect()
    }
    assert cov["en"]["oov_rate"] == 0.0
    assert cov["xx"]["oov_rate"] == 1.0
