"""Multimodal column plumbing tests: payload/metadata schema, deterministic
fake decode over mapInPandas (real Arrow batch shapes), feature extraction,
frame sampling, and the NotImplementedError codec gate."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from airflow_crypto_btc_spark.operators.multimodal import (
    FRAME_CHARS,
    attach_binary_payload,
    decode_media,
    extract_byte_features,
    resize_media,
    sample_frames,
)
from airflow_crypto_btc_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def mm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return attach_binary_payload(docs).cache()


def test_payload_schema_and_checksum(mm):
    schema = dict(mm.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<mime:string,n_bytes:int")
    rows = mm.limit(5).collect()
    for r in rows:
        raw = bytes(r["payload"])
        assert r["meta"]["n_bytes"] == len(raw)
        assert r["meta"]["checksum"] == hashlib.md5(raw).hexdigest()
        assert r["meta"]["mime"] in ("image/jpeg", "audio/wav", "video/mp4")


def test_fake_decode_deterministic_and_byte_derived(mm):
    a = decode_media(mm).orderBy("doc_id").collect()
    b = decode_media(mm).orderBy("doc_id").collect()
    assert a == b  # deterministic across runs
    payloads = {
        r["doc_id"]: bytes(r["payload"]) for r in mm.collect()
    }
    for r in a:
        raw = payloads[r["doc_id"]]
        assert r["width"] == 1 + raw[0] % 64
        assert r["height"] == 1 + raw[1] % 64
        assert r["channels"] == 3 and r["decode_ok"]


def test_real_codec_path_is_stubbed(mm):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — decode gate only fires without it")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_media(mm, use_real_codecs=True).collect()


def test_real_resample_gated_without_pillow(mm):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — resample gate only fires without it")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|resampling"):
        resize_media(mm, use_real_codecs=True).collect()


def test_resize_media_real_codecs_end_to_end(spark):
    """Skipped until the environment gains Pillow; then the real
    resample branch is covered end-to-end: correct target dims + scale
    factors and a decodable PNG result for a good payload,
    resize_ok=false (null dims/bytes, no task failure) for garbage."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    def _png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
        return buf.getvalue()

    mm_real = spark.createDataFrame(
        [(1, _png(8, 16)), (2, b"definitely not an image payload")],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in resize_media(
            mm_real, 4, 4, use_real_codecs=True
        ).collect()
    }
    ok = out[1]
    assert (ok["width"], ok["height"]) == (4, 4)
    assert ok["scale_x"] == pytest.approx(0.5)
    assert ok["scale_y"] == pytest.approx(0.25)
    assert ok["resize_ok"] is True
    with Image.open(io.BytesIO(bytes(ok["resized"]))) as im:
        assert (im.width, im.height) == (4, 4)
    bad = out[2]
    assert bad["resize_ok"] is False
    assert bad["width"] is None and bad["resized"] is None


def test_decode_media_real_codecs_end_to_end(spark):
    """Skipped until the environment gains Pillow; the moment it does,
    the real-codec branch is covered end-to-end: true dimensions for a
    decodable payload, decode_ok=false (null dims, no task failure) for
    garbage bytes."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    def _png(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (10, 20, 30)).save(buf, format="PNG")
        return buf.getvalue()

    schema = (
        "doc_id long, payload binary, "
        "meta struct<mime:string, n_bytes:long, checksum:string>"
    )
    mm_real = spark.createDataFrame(
        [
            (1, _png(5, 7), ("image/png", 0, "a")),
            (2, b"definitely not an image payload", ("image/png", 0, "b")),
        ],
        schema,
    )
    out = {
        r["doc_id"]: r
        for r in decode_media(mm_real, use_real_codecs=True).collect()
    }
    ok = out[1]
    assert (ok["width"], ok["height"], ok["channels"]) == (5, 7, 3)
    assert ok["decode_ok"] is True
    bad = out[2]
    assert bad["decode_ok"] is False
    assert bad["width"] is None and bad["height"] is None


def test_resize_scale_factors(mm):
    out = resize_media(decode_media(mm), 32, 48).limit(5).collect()
    for r in out:
        assert r["width"] == 32 and r["height"] == 48
        assert r["scale_x"] > 0 and r["scale_y"] > 0


def test_byte_features_match_numpy(mm):
    out = {r["doc_id"]: r for r in extract_byte_features(mm, dim=8).collect()}
    for r in mm.limit(5).collect():
        raw = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        hist = np.bincount(raw // 32, minlength=8) / raw.size
        got = out[r["doc_id"]]
        assert got["feat"] == pytest.approx(hist.tolist())
        assert got["feat_norm"] == pytest.approx(float(np.sqrt((hist**2).sum())))
        assert sum(got["feat"]) == pytest.approx(1.0)


def test_frame_sampling_matches_python(mm):
    out = {r["doc_id"]: r for r in sample_frames(mm, every_n=4).collect()}
    for r in mm.limit(5).collect():
        text = bytes(r["payload"]).decode("utf-8")
        n_frames = math.ceil(len(text) / FRAME_CHARS)
        idx = list(range(0, n_frames, 4))
        digests = [
            hashlib.md5(
                text[i * FRAME_CHARS : (i + 1) * FRAME_CHARS].encode()
            ).hexdigest()
            for i in idx
        ]
        got = out[r["doc_id"]]
        assert got["n_frames"] == n_frames
        assert got["n_sampled"] == len(idx)
        assert got["frame_digest"] == "|".join(digests)


def test_audio_windows_overlap_and_counts(spark, sf_dir):
    from airflow_crypto_btc_spark.operators.multimodal import (
        attach_binary_payload,
        window_audio,
    )
    from airflow_crypto_btc_spark.sources.tables import load_table

    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    got = window_audio(mm).toPandas()
    import math

    for _, r in got.iterrows():
        expect = math.ceil(r["n_chars"] / 32) if r["n_chars"] else 0
        assert r["n_windows"] == expect
        digests = r["window_digest"].split("|") if r["window_digest"] else []
        assert len(digests) == r["n_windows"]
        # overlap: consecutive windows share win-hop = 16 chars, so
        # distinct digests unless content repeats exactly
        assert len(digests) == len(set(digests)) or r["n_windows"] > 1


# ------------------------------------------------------ block-hash near-dup


def _payloads(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )


def test_block_hash_detects_in_place_edit(spark):
    """A payload with a small in-place corruption (same length) must land
    within a small Hamming radius of the original; an unrelated payload
    must not pair at ≤3."""
    from airflow_crypto_btc_spark.operators.multimodal import (
        block_hash_near_dup,
    )

    base = "x" * 640
    edited = base[:300] + "CORRUPT" + base[307:]  # touches 1 block of 32
    other = "".join(chr(65 + (i * 7) % 26) for i in range(640))
    mm = _payloads(spark, [(1, base), (2, edited), (3, other)])
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in block_hash_near_dup(mm, n_blocks=32, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(k == (1, 2) for k in pairs)


def test_block_hash_not_insert_robust_documented_trade(spark):
    """The documented fixed-grid trade: a byte INSERTION shifts every
    later block and the pair does NOT surface — the gram family covers
    shifted content."""
    from airflow_crypto_btc_spark.operators.multimodal import (
        block_hash_fingerprints,
        block_hash_near_dup,
    )

    base = "the quick brown fox jumps over the lazy dog " * 16
    shifted = "INSERTED " + base
    mm = _payloads(spark, [(1, base), (2, shifted)])
    assert block_hash_near_dup(mm, n_blocks=32, max_hamming=3).count() == 0
    fps = {
        r.doc_id: r.block_hash
        for r in block_hash_fingerprints(mm, n_blocks=32).collect()
    }
    assert bin(fps[1] ^ fps[2]).count("1") > 3


def test_block_hash_fingerprint_no_shuffle_and_pairs_banded(spark):
    """Scale contract: the fingerprint projection is exchange-free, and
    the pairs plan shuffles only banded (id, bigint) rows — the payload
    column must not appear beyond the scan-side projection."""
    from airflow_crypto_btc_spark.operators.multimodal import (
        block_hash_fingerprints,
        block_hash_near_dup,
    )

    mm = _payloads(spark, [(i, "a" * (64 + i)) for i in range(20)])
    fp_plan = block_hash_fingerprints(mm, 32)._jdf.queryExecution()
    assert "Exchange" not in fp_plan.executedPlan().toString()
    pair_plan = (
        block_hash_near_dup(mm, 32, 3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # verification joins read fingerprints, never payloads
    assert "payload" not in pair_plan.split("Join")[0]


def test_block_hash_empty_and_tiny_payloads(spark):
    """Payloads shorter than the grid (and empty ones) still fingerprint
    deterministically — empty blocks hash md5('') and the operator never
    errors on degenerate media."""
    from airflow_crypto_btc_spark.operators.multimodal import (
        block_hash_fingerprints,
    )

    mm = _payloads(spark, [(1, ""), (2, "ab"), (3, "ab")])
    rows = {
        r.doc_id: (r.n_bytes, r.block_hash)
        for r in block_hash_fingerprints(mm, n_blocks=32).collect()
    }
    assert rows[2] == rows[3]
    assert rows[1][0] == 0
    # all-empty blocks: every bit is parity(md5('')) = parity('d') = 1
    assert rows[1][1] == (1 << 32) - 1
