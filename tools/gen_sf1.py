"""One-off sf1 slice generator for the decade-up scale probe.

The 100 TB design claims in SCALING.md rested on 100x extrapolation
from 17 MB (sf0.001 -> sf0.1); this generates a 10x-beyond-sf0.1 slice
of the three heavy-family tables — ``documents`` (50k rows),
``embeddings`` (20k rows), and ``events`` (1M rows, ns-timestamps) —
matched to the driver fixtures' distributions (same 31-word
vocabulary, length/lang/source mix, exact- and near-dup seeding;
64-dim unit-norm vectors in 10 label clusters; uniform users/types
over the same 30-day window), plus symlinks to the sf0.1 copies of
every other table so any catalog entry runs unmodified.

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


N_EVENTS = 1_000_000
N_USERS = 15_000  # the fixture ladder scales users ∝ rows (15/150/1500)
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
#: the fixture's 30-day window (same at every SF — density scales)
_TS_LO_NS = 1_704_067_200_000_000_000  # 2024-01-01 00:00:00 UTC
_TS_HI_NS = 1_706_659_200_000_000_000  # 2024-01-31 00:00:00 UTC


def gen_events(rng: np.random.Generator) -> pa.Table:
    """10× events matched to the fixture shape: uniform users, uniform
    5-way event types, value ~ U(0,100), props a one-key JSON int —
    and ts written as NANOSECOND parquet timestamps so the probe
    exercises the same nanosAsLong read path as the driver fixture."""
    ts = np.sort(
        rng.integers(_TS_LO_NS, _TS_HI_NS, size=N_EVENTS, dtype=np.int64)
    )
    return pa.table(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "ts": pa.array(ts, type=pa.timestamp("ns")),
            "user_id": rng.integers(0, N_USERS, size=N_EVENTS),
            "event_type": pa.array(
                np.array(_EVENT_TYPES)[
                    rng.integers(0, len(_EVENT_TYPES), size=N_EVENTS)
                ]
            ),
            "value": rng.uniform(0, 100, size=N_EVENTS),
            "props": pa.array(
                [
                    '{"k": %d}' % k
                    for k in rng.integers(0, 100, size=N_EVENTS)
                ]
            ),
        }
    )


_GENERATED = ("documents.parquet", "embeddings.parquet", "events.parquet")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    pq.write_table(gen_documents(rng), os.path.join(OUT, "documents.parquet"))
    pq.write_table(gen_embeddings(rng), os.path.join(OUT, "embeddings.parquet"))
    ev_path = os.path.join(OUT, "events.parquet")
    if os.path.islink(ev_path):  # pre-round-10-second-wave slice
        os.unlink(ev_path)
    pq.write_table(gen_events(rng), ev_path)
    for name in os.listdir(SRC):
        if name.endswith(".parquet") and name not in _GENERATED:
            dst = os.path.join(OUT, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, name), dst)
    sizes = {
        n: os.path.getsize(os.path.join(OUT, n)) for n in _GENERATED
    }
    print(f"wrote {OUT}: {sizes}")


if __name__ == "__main__":
    sys.exit(main())
