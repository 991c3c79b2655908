"""One-off sf1 slice generator for the decade-up scale probe.

The 100 TB design claims in SCALING.md rested on 100x extrapolation
from 17 MB (sf0.001 -> sf0.1); this generates a 10x-beyond-sf0.1 slice
of the two heavy-family tables — ``documents`` (50k rows) and
``embeddings`` (20k rows) — matched to the driver fixtures'
distributions (same 31-word vocabulary, length/lang/source mix, exact-
and near-dup seeding; 64-dim unit-norm vectors in 10 label clusters),
plus symlinks to the sf0.1 copies of every other table so any catalog
entry runs unmodified.

Deterministic (seed 42), writes ONLY under <repo>/.scale/sf1 (the
testdata tree is read-only), gitignored — an artifact, not a fixture.

Usage: python tools/gen_sf1.py   (then
       SPARK_GRAFT_PROBE_DIRS=/root/testdata/sf0.1,<repo>/.scale/sf1 \
       python tools/scale_probe.py <names...>)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scale", "sf1")

N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
N_LABELS = 10


def _vocab_from_fixture() -> list[str]:
    """The fixture corpus' own word list (31 words at sf0.1) — reusing
    it keeps shingle diversity, BPE pair structure, and token Zipf shape
    comparable across the probe boundary."""
    import duckdb

    con = duckdb.connect()
    words = [
        w
        for (w,) in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{SRC}/documents.parquet' ORDER BY 1"
        ).fetchall()
        if w
    ]
    con.close()
    return words


def gen_documents(rng: np.random.Generator) -> pa.Table:
    vocab = np.array(_vocab_from_fixture())
    # Zipf-ish word weights (the fixture shows a skewed unigram table)
    w = 1.0 / np.arange(1, len(vocab) + 1)
    w /= w.sum()
    langs = np.array(["en", "fr", "de", "es", "zh"])
    lang_p = np.array([0.41, 0.15, 0.14, 0.15, 0.15])

    texts: list[str] = []
    n_words = rng.integers(8, 100, size=N_DOCS)
    for i in range(N_DOCS):
        idx = rng.choice(len(vocab), size=int(n_words[i]), p=w)
        texts.append(" ".join(vocab[idx]))
    # exact dups (~1%): copy an earlier doc verbatim
    for i in rng.choice(np.arange(1000, N_DOCS), size=N_DOCS // 100,
                        replace=False):
        texts[int(i)] = texts[int(rng.integers(0, 1000))]
    # near dups (~0.5%): copy with a handful of word substitutions
    for i in rng.choice(np.arange(1000, N_DOCS), size=N_DOCS // 200,
                        replace=False):
        base = texts[int(rng.integers(0, 1000))].split()
        for _ in range(3):
            base[int(rng.integers(0, len(base)))] = str(
                vocab[int(rng.integers(0, len(vocab)))]
            )
        texts[int(i)] = " ".join(base)
    doc_id = np.arange(N_DOCS, dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": rng.choice(langs, size=N_DOCS, p=lang_p),
            "source": np.array([f"src{i % 20}" for i in range(N_DOCS)]),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(rng: np.random.Generator) -> pa.Table:
    centers = rng.normal(size=(N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=N_VECS)
    vecs = centers[labels] + 0.35 * rng.normal(size=(N_VECS, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": np.arange(N_VECS, dtype=np.int64),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(),
                type=pa.list_(pa.float32()),
            ),
            "label": labels.astype(np.int32),
        }
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(rng), os.path.join(OUT, "embeddings.parquet"))
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name not in (
            "documents.parquet", "embeddings.parquet"
        ):
            dst = os.path.join(OUT, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, name), dst)
    sizes = {
        n: os.path.getsize(os.path.join(OUT, n))
        for n in ("documents.parquet", "embeddings.parquet")
    }
    print(f"wrote {OUT}: {sizes}")


if __name__ == "__main__":
    sys.exit(main())
