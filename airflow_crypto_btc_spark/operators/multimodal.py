"""Multimodal column handling: opaque ``binary`` payloads + typed metadata,
with decode / feature-extraction / resize / frame-sampling plumbing.

The reference has no media columns; this is north-star surface for a
training-data pipeline (BASELINE.json): at 100 TB, images/audio/video live
as ``binary`` columns (or object-store pointers) beside typed metadata, and
every per-item transform runs as an Arrow-batched Pandas UDF via
``mapInPandas`` — never a row-at-a-time Python UDF, never a driver loop.

Container constraint: no image/audio codecs are installed.  The real
decode AND resample branches are fully implemented against Pillow with
the import deferred to the executor-side kernel site —
``use_real_codecs=True`` raises ``NotImplementedError`` there only when
Pillow is absent (this container), and the default path substitutes a
**deterministic fake** derived from the payload bytes.  Everything
around the kernels — schemas, UDF signatures, Arrow batch shapes,
partitioning — is real and tested; the real branches are covered under
``pytest.importorskip("PIL")`` and light up the moment the environment
gains Pillow.

Scale notes: ``mapInPandas`` streams Arrow record batches through Python;
peak executor memory is one batch (``spark.sql.execution.arrow.
maxRecordsPerBatch``), not one partition.  Decode is embarrassingly
parallel — no shuffle at all; the only exchange in this module is the
optional ``repartition`` to spread large payloads evenly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed "frame" width (characters) for the fake video payload layout.
FRAME_CHARS = 32

_MIMES = ("image/jpeg", "audio/wav", "video/mp4")


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal at-rest table on the ``documents`` fixture: the
    UTF-8 bytes of ``text`` play the opaque media payload, and a typed
    metadata struct rides beside it (mime, byte length, md5 checksum).

    All JVM-side expressions — payload construction never touches Python.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(m) for m in _MIMES]),
                (F.col("doc_id") % 3 + 1).cast("int"),
            ).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


# ------------------------------------------------------------------- decode

_DECODE_SCHEMA = (
    "doc_id long, mime string, width int, height int, channels int, "
    "decode_ok boolean"
)


def decode_media(
    mm: DataFrame, use_real_codecs: bool = False
) -> DataFrame:
    """Per-item "decode" via ``mapInPandas``: batches arrive as pandas
    DataFrames with ``payload`` as ``bytes`` objects (Arrow binary), the
    kernel emits typed dimensions.

    The real-codec branch decodes with Pillow (imported lazily AT THE
    KERNEL SITE, executor-side) — per-item decode failures land as
    ``decode_ok=false`` rows with null dimensions, never a task failure.
    When Pillow is absent from the environment (this container), the
    branch raises ``NotImplementedError`` at the same seam; the fake
    branch derives deterministic dimensions from the first payload bytes
    so tests (and the driver) get stable output with the exact batch
    shape the real decoder sees.  tests/test_multimodal.py covers the
    real branch under ``pytest.importorskip("PIL")`` so it is exercised
    the moment the environment gains Pillow.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_codecs:
                try:
                    from PIL import Image
                except ImportError as exc:
                    raise NotImplementedError(
                        "media codecs (Pillow/libav) are not installed in "
                        "this environment; deterministic fake decode is "
                        "the default"
                    ) from exc
                import io

                widths, heights, chans, oks = [], [], [], []
                for raw in pdf["payload"]:
                    try:
                        with Image.open(io.BytesIO(bytes(raw))) as im:
                            widths.append(im.width)
                            heights.append(im.height)
                            chans.append(len(im.getbands()))
                            oks.append(True)
                    except Exception:  # undecodable item, not a bug
                        widths.append(None)
                        heights.append(None)
                        chans.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "mime": pdf["meta"].map(lambda m: m["mime"]),
                        "width": pd.array(widths, dtype="Int32"),
                        "height": pd.array(heights, dtype="Int32"),
                        "channels": pd.array(chans, dtype="Int32"),
                        "decode_ok": oks,
                    }
                )
                continue
            payloads = pdf["payload"]
            first = payloads.map(lambda b: b[0] if len(b) else 0)
            second = payloads.map(lambda b: b[1] if len(b) > 1 else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                    "width": (1 + first % 64).astype("int32"),
                    "height": (1 + second % 64).astype("int32"),
                    "channels": 3,
                    "decode_ok": payloads.map(len) > 0,
                }
            )

    return mm.mapInPandas(_decode, schema=_DECODE_SCHEMA)


_RESIZE_REAL_SCHEMA = (
    "doc_id long, width int, height int, scale_x double, "
    "scale_y double, resized binary, resize_ok boolean"
)


def resize_media(
    decoded: DataFrame,
    target_w: int = 32,
    target_h: int = 32,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Resize to (``target_w``, ``target_h``).

    Fake branch (default): consumes DECODE output (has ``width`` /
    ``height``), emits target dims + the scale factors a real resampler
    would apply — pure JVM expressions, no payload needed.

    Real branch (``use_real_codecs=True``): consumes a PAYLOAD-carrying
    frame (``doc_id``, ``payload`` — the same input shape as
    :func:`decode_media`, because resampling needs the pixels, not just
    the dimensions), decodes + resizes with Pillow (imported lazily AT
    THE KERNEL SITE, executor-side — the same seam as ``decode_media``'s
    real branch) and re-encodes the result as PNG bytes.  Bilinear
    resampling — a fixed, version-stable filter choice, so re-runs are
    reproducible.  Per-item failures (undecodable payloads) land as
    ``resize_ok=false`` rows with null dims/bytes, never a task failure;
    an environment without Pillow raises ``NotImplementedError`` at the
    kernel site.  Output schema adds ``resized``/``resize_ok`` to the
    fake branch's columns.  Narrow transform either way — no shuffle."""
    if use_real_codecs:

        def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            try:
                from PIL import Image
            except ImportError as exc:
                raise NotImplementedError(
                    "real resampling needs Pillow, which is not "
                    "installed in this environment; the fake branch is "
                    "the default"
                ) from exc
            import io

            for pdf in batches:
                ws, hs, sxs, sys_, outs, oks = [], [], [], [], [], []
                for raw in pdf["payload"]:
                    try:
                        with Image.open(io.BytesIO(bytes(raw))) as im:
                            ow, oh = im.width, im.height
                            resized = im.resize(
                                (target_w, target_h), Image.BILINEAR
                            )
                            buf = io.BytesIO()
                            resized.save(buf, format="PNG")
                        ws.append(target_w)
                        hs.append(target_h)
                        sxs.append(target_w / ow)
                        sys_.append(target_h / oh)
                        outs.append(buf.getvalue())
                        oks.append(True)
                    except NotImplementedError:
                        raise
                    except Exception:  # undecodable item, not a bug
                        ws.append(None)
                        hs.append(None)
                        sxs.append(None)
                        sys_.append(None)
                        outs.append(None)
                        oks.append(False)
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": pd.array(ws, dtype="Int32"),
                        "height": pd.array(hs, dtype="Int32"),
                        "scale_x": pd.array(sxs, dtype="Float64"),
                        "scale_y": pd.array(sys_, dtype="Float64"),
                        "resized": outs,
                        "resize_ok": oks,
                    }
                )

        return decoded.mapInPandas(_resize, schema=_RESIZE_REAL_SCHEMA)
    return decoded.select(
        "doc_id",
        F.lit(target_w).alias("width"),
        F.lit(target_h).alias("height"),
        (F.lit(target_w) / F.col("width")).alias("scale_x"),
        (F.lit(target_h) / F.col("height")).alias("scale_y"),
    )


# ----------------------------------------------------------------- features

_FEATURE_SCHEMA = "doc_id long, feat array<double>, feat_norm double"


def extract_byte_features(mm: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature extraction: normalized byte-bucket histogram
    (``dim`` buckets over 0-255) as ``array<double>`` — the stand-in for an
    embedding model, with the same Spark shape (vectorized numpy over Arrow
    batches, fixed-width array output feeding the similarity operators)."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, norms = [], []
            for b in pdf["payload"]:
                arr = np.frombuffer(b, dtype=np.uint8)
                if arr.size == 0:
                    v = np.zeros(dim)
                else:
                    hist = np.bincount(arr // (256 // dim), minlength=dim)
                    v = hist / arr.size
                feats.append(v.tolist())
                norms.append(float(np.sqrt((v * v).sum())))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "feat": feats, "feat_norm": norms}
            )

    return mm.mapInPandas(_feat, schema=_FEATURE_SCHEMA)


# ------------------------------------------------------------ frame sampling


def sample_frames(mm: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for "video" payloads: the decoded payload is treated
    as a sequence of fixed-width ``FRAME_CHARS`` frames; keep every
    ``every_n``-th frame (frame 0, n, 2n, …) and emit checksums.

    Character-based slicing (not byte-based) so multi-byte UTF-8 content
    frames identically in any engine.  Pure JVM-side: ``sequence`` +
    ``transform`` higher-order functions — no Python in the hot path, fully
    oracle-checkable.
    """
    txt = F.decode(F.col("payload"), "UTF-8")
    n_frames = F.ceil(F.length(txt) / F.lit(FRAME_CHARS)).cast("long")
    # sequence(0, -1, +4) errors on empty payloads — guard to empty array
    idx = F.when(
        n_frames > 0,
        F.sequence(
            F.lit(0).cast("long"), n_frames - 1, F.lit(every_n).cast("long")
        ),
    ).otherwise(F.array().cast("array<long>"))  # 0, n, 2n, … < n_frames
    frames = F.transform(
        idx,
        # substring is 1-based; frame i covers chars [i*W, (i+1)*W)
        lambda i: F.md5(
            F.encode(
                F.substring(
                    txt, (i * FRAME_CHARS + 1).cast("int"), FRAME_CHARS
                ),
                "UTF-8",
            )
        ),
    )
    return mm.select(
        "doc_id",
        n_frames.alias("n_frames"),
        F.size(idx).cast("long").alias("n_sampled"),
        F.array_join(frames, "|").alias("frame_digest"),
    )


# ------------------------------------------------------- audio windowing

WIN_CHARS = 48
HOP_CHARS = 32


def window_audio(
    mm: DataFrame, win: int = WIN_CHARS, hop: int = HOP_CHARS
) -> DataFrame:
    """Overlapping fixed-rate windowing for "audio" payloads — the STFT /
    feature-extraction framing pattern (window > hop ⇒ overlap), on the
    opaque payload.  A window starts every ``hop`` chars and spans
    ``win`` chars (the trailing partial window is kept, as libraries'
    ``center=False`` framing does for the final hop that still has ≥ 1
    sample).  Same design rules as frame sampling: character-addressed,
    JVM higher-order functions only, each window materialized once inside
    one transform lambda (never re-derived per output row), digests in
    place of waveforms so the op is exactly oracle-checkable."""
    txt = F.decode(F.col("payload"), "UTF-8")
    n = F.length(txt)
    n_windows = F.when(
        n > 0, F.ceil((n.cast("double")) / F.lit(hop)).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    offsets = F.when(
        n_windows > 0,
        F.sequence(
            F.lit(0).cast("long"),
            (n_windows - 1) * hop,
            F.lit(hop).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    digests = F.transform(
        offsets,
        lambda o: F.md5(
            F.encode(F.substring(txt, (o + 1).cast("int"), win), "UTF-8")
        ),
    )
    return mm.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        n_windows.alias("n_windows"),
        F.array_join(digests, "|").alias("window_digest"),
    )


# ----------------------------------------------------- block-hash near-dup


def block_hash_fingerprints(
    mm: DataFrame,
    n_blocks: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-payload ``n_blocks``-bit block-hash fingerprint — the
    multimodal analogue of SimHash for OPAQUE media payloads: split the
    byte string into ``n_blocks`` equal spans, digest each span, keep one
    parity bit per span.  Payloads that differ by a localized in-place
    edit (re-encoded header, truncated metadata chunk, corrupted region)
    differ in only the touched blocks' bits, so near-identical media
    collapses under a small Hamming radius while unrelated payloads land
    ~``n_blocks/2`` bits apart.

    Deliberately NOT insert-robust: a byte insertion shifts every later
    block boundary and randomizes the tail bits — that is the standard
    fixed-grid block-hash trade (content-defined chunking or the token
    n-gram family in operators/text.py cover shifted content).

    All JVM-side expressions over the ``binary`` column — block slicing
    with integer bounds ``[(i·L) div n, ((i+1)·L) div n)``, md5 per
    block, parity of the first hex nibble — one embarrassingly parallel
    projection, no shuffle, no Python.  ``n_blocks`` ≤ 32 keeps the
    fingerprint comfortably in a bigint.
    """
    if not 1 <= n_blocks <= 32:
        raise ValueError("n_blocks must be in [1, 32]")
    bit = (
        f"cast(conv(substr(md5(substring({payload_col}, "
        f"cast(1 + (i * L) div {n_blocks} as int), "
        f"cast(((i + 1) * L) div {n_blocks} - (i * L) div {n_blocks} as int)"
        f")), 1, 1), 16, 10) as int) % 2"
    )
    fp = F.expr(
        f"aggregate(sequence(0, {n_blocks - 1}), cast(0 as bigint), "
        f"(acc, i) -> acc + shiftleft(cast(({bit}) as bigint), i))"
    )
    return mm.withColumn(
        "L", F.length(payload_col).cast("bigint")
    ).select(
        F.col(id_col),
        F.col("L").alias("n_bytes"),
        fp.alias("block_hash"),
    )


def block_hash_near_dup(
    mm: DataFrame,
    n_blocks: int = 32,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Multimodal near-duplicate pairs: block-hash fingerprints joined by
    the shared pigeonhole-banded Hamming engine
    (operators/dedup.banded_hamming_pairs) — candidates shuffle on
    (band_idx, band_bits), never all-pairs, and the popcount(xor) verify
    is exact.  Returns (id_a, id_b, hamming), id_a < id_b.

    At 100 TB the payloads never move: only (id, 64-bit fingerprint)
    rows enter the shuffle, so the exchange is a few bytes per media
    object regardless of object size.
    """
    fps = block_hash_fingerprints(
        mm, n_blocks, id_col=id_col, payload_col=payload_col
    ).select(F.col(id_col).alias("id"), F.col("block_hash").alias("fp"))
    from airflow_crypto_btc_spark.operators.dedup import (
        banded_hamming_pairs,
    )

    return banded_hamming_pairs(
        fps,
        bits=n_blocks,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
