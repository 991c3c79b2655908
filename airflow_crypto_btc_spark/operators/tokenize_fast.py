"""Arrow-batched vectorized twins of the tokenizer segmentation
kernels (round-15 optimization; the ``dedup_fast`` doctrine applied to
the tokenizer serve family).

The segmentation DPs in ``operators/unigram.py`` (Viterbi) and
``operators/wordpiece.py`` (greedy MaxMatch) are row-local higher-order
``aggregate``/``transform`` SQL expressions.  HOF lambdas are
INTERPRETED per element in the JVM — a lambda dispatch per (position,
candidate length) — which made the tokenizer family the most expensive
untouched block after round 14 (~14-16 s across entries at sf0.1).
These twins run the identical dynamic programs in a ``mapInPandas``
Python worker at dict-lookup speed.

**Bit-parity is by construction, not hope** (the dedup_fast standard):

- All DP scores are integer micro-units (BIGINT in the JVM, int in
  Python) — no float enters any comparison.
- The Viterbi tie-break is the (score, l, seg) struct order.  Python
  tuple comparison is field-by-field like Spark's struct comparison,
  and Python's code-point string order equals Spark's UTF8String
  byte order (UTF-8 byte order preserves code-point order).
- ``substr``/``length`` in Spark operate on code points, exactly like
  Python string indexing/len.
- The models (piece → score/id maps) are SEED-BOUNDED (≤ seed_size
  rows ≤ a few hundred) at every scale — collecting one to the driver
  is the same bounded cost as the broadcast build the HOF path paid,
  and the repo precedent (``bpe_train``'s capped collect,
  ``cosine_topk_fast``'s query collect) already established the shape.
  The WORD table — the distributed axis (vocabulary-sized at 100 TB) —
  stays in Spark and flows through the Arrow batches.

``tests/test_tokenize_fast.py`` asserts frame-equality between each
twin and its HOF original on adversarial word sets (ties, multi-byte
UTF-8, unreachable words, the empty-word quirk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _collect_pairs(df: DataFrame, k: str, v: str) -> dict:
    """Collect a bounded (piece, value) model frame into a dict — the
    driver-side image of the broadcast map the HOF path built."""
    return {r[k]: r[v] for r in df.select(k, v).collect()}


def _viterbi_word(
    word: str, vm: dict, max_piece_len: int
) -> tuple[int, str] | None:
    """The row-local Viterbi DP of ``unigram._viterbi_expr`` in Python:
    dp[i] = best (score, l, seg) covering the length-i prefix, best =
    max over ≤max_piece_len candidates under the (score, l, seg) struct
    order (highest score, then LONGEST final piece, then piece text).
    Returns (score, seg) of the terminal, or None (unreachable word —
    the caller's [UNK]/byte-fallback case)."""
    n = len(word)
    dp: list[tuple[int, int, str] | None] = [None] * (n + 1)
    dp[0] = (0, 0, "")
    for i in range(1, n + 1):
        best = None
        lmax = max_piece_len if max_piece_len < i else i
        for ln in range(1, lmax + 1):
            prev = dp[i - ln]
            if prev is None:
                continue
            piece = word[i - ln : i]
            lp = vm.get(piece)
            if lp is None:
                continue
            cand = (
                prev[0] + lp,
                ln,
                piece if i == ln else prev[2] + " " + piece,
            )
            if best is None or cand > best:
                best = cand
        dp[i] = best
    t = dp[n]
    return None if t is None else (t[0], t[2])


def viterbi_segment_fast(
    words: DataFrame,
    scored: DataFrame,
    max_piece_len: int = 3,
    word_col: str = "word",
) -> DataFrame:
    """Arrow twin of ``unigram.viterbi_segment``: same input contract
    (any word set + a (piece, lp) model), same output (input columns
    plus ``seg``/``lp``, NULL seg = no segmentation exists), identical
    values by the integer-DP parity argument above."""
    import pandas as pd

    vm = _collect_pairs(scored, "piece", "lp")
    in_cols = list(words.columns)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in words.schema.fields
    )

    def _run(batches):
        memo: dict[str, tuple[int, str] | None] = {}
        for pdf in batches:
            segs: list[str | None] = []
            lps: list[int | None] = []
            for w in pdf[word_col]:
                hit = memo.get(w)
                if hit is None and w not in memo:
                    hit = _viterbi_word(w, vm, max_piece_len)
                    memo[w] = hit
                if hit is None:
                    segs.append(None)
                    lps.append(None)
                else:
                    segs.append(hit[1])
                    lps.append(hit[0])
            out = {c: pdf[c] for c in in_cols}
            out["seg"] = segs
            out["lp"] = pd.array(lps, dtype="Int64")
            yield pd.DataFrame(out)

    return words.mapInPandas(
        _run, schema=f"{fields}, seg string, lp long"
    )


def _maxmatch_word(
    word: str, vocab: set, max_piece_len: int
) -> tuple[str, int, bool]:
    """The greedy MaxMatch walk of ``wordpiece.wordpiece_segment`` in
    Python: at each position the LONGEST vocab piece wins (raw form at
    position 1, ``##``-form after); any position with no match fails
    the WHOLE word to [UNK].  Returns (pieces_str, n_pieces, is_unk)."""
    n = len(word)
    pos = 0  # 0-based; the SQL walk is 1-based
    pieces: list[str] = []
    while pos < n:
        best = None
        lmax = max_piece_len if max_piece_len < n - pos else n - pos
        for ln in range(lmax, 0, -1):
            cand = word[pos : pos + ln]
            if pos > 0:
                cand = "##" + cand
            if cand in vocab:
                best = (ln, cand)
                break
        if best is None:
            return ("[UNK]", 1, True)
        pieces.append(best[1])
        pos += best[0]
    return (" ".join(pieces), len(pieces), False)


def wordpiece_segment_fast(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 3,
    word_col: str = "word",
) -> DataFrame:
    """Arrow twin of ``wordpiece.wordpiece_segment``: same contract,
    same output columns (word, pieces_str, n_pieces, is_unk).  The
    greedy walk is deterministic string matching — no ordering or
    float subtleties at all; parity needs only the code-point
    substring semantics shared by both runtimes."""
    import pandas as pd

    vs = set(_collect_pairs(vocab, "piece", "piece_id"))
    word_type = words.schema[word_col].dataType.simpleString()

    def _run(batches):
        memo: dict[str, tuple[str, int, bool]] = {}
        for pdf in batches:
            ps, ns, unks = [], [], []
            for w in pdf[word_col]:
                hit = memo.get(w)
                if hit is None:
                    hit = _maxmatch_word(w, vs, max_piece_len)
                    memo[w] = hit
                ps.append(hit[0])
                ns.append(hit[1])
                unks.append(hit[2])
            yield pd.DataFrame(
                {
                    word_col: pdf[word_col],
                    "pieces_str": ps,
                    "n_pieces": ns,
                    "is_unk": unks,
                }
            )

    return words.select(word_col).mapInPandas(
        _run,
        schema=(
            f"`{word_col}` {word_type}, pieces_str string, "
            "n_pieces long, is_unk boolean"
        ),
    )


# ------------------------------------------------------------------ BPE
# Java \s (what Spark's split compiles) — NOT Python \s (Unicode-aware);
# the dedup_fast tokenization-parity trap, same fix
import re as _re

_JAVA_WS = _re.compile("[ \t\n\x0b\f\r]+")

_BPE_EOW = "</w>"
_BPE_MARK = "\x1f"
_BPE_SCRUB_TABLE = str.maketrans("", "", "\x1f\x1e")


def _bpe_count_word(w: str, merges) -> int:
    """Post-merge symbol count of one (already-scrubbed) word,
    replicating ``vocab.bpe_encode_counts``'s marker-string pipeline
    STRING OP FOR STRING OP (build the spaced marker-terminated
    sequence, apply each merge as a literal left-to-right replace in
    training order, count = size(split(btrim(s), ' '))) — including
    Spark's ``sequence(1, 0) = [1, 0]`` quirk for an empty-after-scrub
    word, so parity holds on every input, not just clean ones."""
    if w:
        parts = [c + _BPE_MARK for c in w]
    else:
        # sequence(1, length('')) = sequence(1, 0) = [1, 0] in Spark:
        # two substr('', …) = '' elements, each marker-terminated
        parts = [_BPE_MARK, _BPE_MARK]
    s = " " + " ".join(parts) + " " + _BPE_EOW + _BPE_MARK
    for _step, left, right, _pc in merges:
        s = s.replace(
            f" {left}{_BPE_MARK} {right}{_BPE_MARK}",
            f" {left}{right}{_BPE_MARK}",
        )
    return len(s.strip(" ").split(" "))


def bpe_counts_fast(
    docs: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Arrow twin of ``vocab.bpe_encode_counts``: (id, n_words,
    n_bpe_tokens) with the merge chain evaluated ONCE PER DISTINCT WORD
    per batch (dict memo) instead of once per word INSTANCE per
    document — the merge list is already a driver-side Python list in
    every caller (the persisted model is kilobytes)."""
    import pandas as pd

    mg = [tuple(m) for m in merges]

    def _run(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words: list[int] = []
            n_bpe: list[int | None] = []
            for txt in pdf[text_col]:
                if not isinstance(txt, str):
                    # split(NULL) → NULL: size() = -1, aggregate = NULL
                    n_words.append(-1)
                    n_bpe.append(None)
                    continue
                toks = [t for t in _JAVA_WS.split(txt) if t]
                n_words.append(len(toks))
                total = 0
                for t in toks:
                    w = t.translate(_BPE_SCRUB_TABLE)
                    c = memo.get(w)
                    if c is None:
                        c = _bpe_count_word(w, mg)
                        memo[w] = c
                    total += c
                n_bpe.append(total)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": n_words,
                    "n_bpe_tokens": pd.array(n_bpe, dtype="Int64"),
                }
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        _run,
        schema=f"`{id_col}` {id_type}, n_words long, n_bpe_tokens long",
    )
