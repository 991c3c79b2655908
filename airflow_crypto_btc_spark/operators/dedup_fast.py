"""Arrow-batched vectorized twins of the HOF dedup kernels.

The expression-based kernels in ``operators/dedup.py`` stay inside
whole-stage codegen but pay JVM expression-interpretation overhead per
(token, seed) / (token, bit).  These twins move the per-document signature
loop into a ``mapInPandas`` Python worker where

- each distinct token / shingle is digested **once per batch** (a dict
  memoizes md5s across the batch — corpora share vocabulary, so the
  amortized digest count per document drops well below the HOF path's), and
- ``hashlib.md5`` runs at C speed on bytes.

Unlike the BLAS cosine twin (``similarity.cosine_topk_fast``), these are
**bit-identical** to the HOF operators — md5 is md5 and min/sign over hex
strings has no float associativity problem — so the twins share the SAME
DuckDB oracles as their exact counterparts, and ``tests/test_dedup.py``
additionally asserts frame equality between twin and HOF output.

Tokenization parity trap: Spark's ``split(text, '\\\\s+')`` is a JAVA
regex — ``\\s`` is ASCII-only ``[ \\t\\n\\x0B\\f\\r]`` — while Python's
``\\s`` is Unicode-aware (would also split on U+00A0/U+3000, which CJK
documents contain).  The twins therefore use the explicit ASCII class.
"""

from __future__ import annotations

import re
from hashlib import md5 as _md5

from pyspark.sql import DataFrame

from airflow_crypto_btc_spark.operators.physical import widen_small_input

#: Per-task input floor for the md5 shingle/signature kernels: they burn
#: num_hashes md5 calls per shingle — orders of magnitude more CPU per
#: input byte than a BLAS pass — so even a few KB of text per task is
#: worth a round-robin shuffle (the column-pruned scan estimate of the
#: sf0.1 documents table is ~250 KB and measured fastest at full width).
_MD5_KERNEL_FLOOR = 8 << 10

# Java \s (what Spark's split compiles), NOT Python \s
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")


def _tokens(text) -> list[str]:
    if not isinstance(text, str):
        return []
    return [t for t in _JAVA_WS.split(text) if t]


def minhash_signatures_fast(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 12,
) -> DataFrame:
    """Vectorized twin of ``minhash_signatures``: returns
    ``(doc_id, sig, set_size)`` with ``sig`` already pipe-joined (the
    registry's comparison form; empty shingle set → empty string, matching
    ``array_join`` over an all-null HOF signature)."""
    import pandas as pd

    def _run(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            sigs, sizes = [], []
            for txt in pdf[text_col]:
                toks = _tokens(txt)
                if len(toks) >= k_shingle:
                    sh = {
                        " ".join(toks[i : i + k_shingle])
                        for i in range(len(toks) - k_shingle + 1)
                    }
                else:
                    sh = set()
                sizes.append(len(sh))
                if not sh:
                    sigs.append("")
                    continue
                mins: list[str] | None = None
                for s in sh:
                    hx = cache.get(s)
                    if hx is None:
                        enc = s.encode("utf-8")
                        hx = [
                            _md5(b"%d|%s" % (j, enc)).hexdigest()
                            for j in range(num_hashes)
                        ]
                        cache[s] = hx
                    mins = (
                        list(hx)
                        if mins is None
                        else [m if m < h else h for m, h in zip(mins, hx)]
                    )
                sigs.append("|".join(mins))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "sig": sigs, "set_size": sizes}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return widen_small_input(
        df.select(id_col, text_col), min_bytes_per_task=_MD5_KERNEL_FLOOR
    ).mapInPandas(
        _run, schema=f"doc_id {id_type}, sig string, set_size long"
    )


def minhash_prep_fast(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """One-pass Arrow kernel feeding the LSH pair pipeline: returns
    ``(id, band_keys, shingle_set, set_size)`` — everything
    ``minhash_lsh_pairs`` needs downstream (band keys for the bucket
    join, shingle sets for the exact-Jaccard verify) from a SINGLE scan
    of the corpus, so the expensive signature math runs once per document
    in C-speed md5 with cross-document memoization.

    Bit-parity with the HOF path: ``band_keys[b]`` equals Spark's
    ``md5(array_join(slice(sig, b*r+1, r), ''))`` — including the
    empty-shingle case, where every HOF signature entry is NULL,
    ``array_join`` yields ``''`` and the band key degenerates to
    ``md5('')`` (such docs all band together; see the bucket cap in
    ``operators/dedup.minhash_lsh_pairs``).
    """
    import pandas as pd

    rows_per_band = num_hashes // bands

    def _run(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            keys, sets_out, sizes = [], [], []
            for txt in pdf[text_col]:
                toks = _tokens(txt)
                if len(toks) >= k_shingle:
                    sh = {
                        " ".join(toks[i : i + k_shingle])
                        for i in range(len(toks) - k_shingle + 1)
                    }
                else:
                    sh = set()
                sets_out.append(sorted(sh))
                sizes.append(len(sh))
                if not sh:
                    # HOF parity: all-null sig → array_join '' per band
                    empty = _md5(b"").hexdigest()
                    keys.append([empty] * bands)
                    continue
                mins: list[str] | None = None
                for s in sh:
                    hx = cache.get(s)
                    if hx is None:
                        enc = s.encode("utf-8")
                        hx = [
                            _md5(b"%d|%s" % (j, enc)).hexdigest()
                            for j in range(num_hashes)
                        ]
                        cache[s] = hx
                    mins = (
                        list(hx)
                        if mins is None
                        else [m if m < h else h for m, h in zip(mins, hx)]
                    )
                keys.append(
                    [
                        _md5(
                            "".join(
                                mins[b * rows_per_band : (b + 1) * rows_per_band]
                            ).encode()
                        ).hexdigest()
                        for b in range(bands)
                    ]
                )
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "band_keys": keys,
                    "shingle_set": sets_out,
                    "set_size": sizes,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return widen_small_input(
        df.select(id_col, text_col), min_bytes_per_task=_MD5_KERNEL_FLOOR
    ).mapInPandas(
        _run,
        schema=(
            f"id {id_type}, band_keys array<string>, "
            "shingle_set array<string>, set_size long"
        ),
    )


def simhash_fingerprints_fast(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """Vectorized twin of ``simhash_fingerprints``: (doc_id, simhash)."""
    import numpy as np
    import pandas as pd

    parity = {c: int(c, 16) & 1 for c in "0123456789abcdef"}

    def _run(batches):
        for pdf in batches:
            cache: dict[str, "np.ndarray"] = {}
            out = []
            for txt in pdf[text_col]:
                toks = _tokens(txt)
                sums = np.zeros(bits, dtype=np.int64)
                for t in toks:
                    p = cache.get(t)
                    if p is None:
                        hx = _md5(t.encode("utf-8")).hexdigest()
                        p = np.array(
                            [1 if parity[hx[i]] else -1 for i in range(bits)],
                            dtype=np.int64,
                        )
                        cache[t] = p
                    sums += p
                out.append(
                    int(sum(1 << i for i in range(bits) if sums[i] > 0))
                )
            yield pd.DataFrame({"doc_id": pdf[id_col], "simhash": out})

    id_type = df.schema[id_col].dataType.simpleString()
    return widen_small_input(
        df.select(id_col, text_col), min_bytes_per_task=_MD5_KERNEL_FLOOR
    ).mapInPandas(
        _run, schema=f"doc_id {id_type}, simhash long"
    )
