"""Byte-pair encoding tokenizer — train + distributed apply.

The missing piece between "token counting by whitespace regex"
(registry text_stats) and a real subword pipeline: BPE (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL 2016;
the GPT-2 tokenizer family is this algorithm over bytes).

Scale contract — the SAMPLED-FIT pattern shared with the PQ/IVF
codebooks and the IVF coarse quantizer:

- TRAIN sees the word FREQUENCY TABLE, not the corpus: one distributed
  split+explode+groupBy produces (word, count); the top-``vocab_cap``
  rows by count come to the driver (a bounded TakeOrdered collect) and
  classic greedy pair-merging runs there. A 100 TB corpus trains its
  merges from the same capped table — rare tail words can't win a merge
  anyway (their pair counts are dominated), which is why every
  production BPE trains on a frequency table.
- APPLY is an Arrow-batched pandas UDF with the merge list riding the
  closure (~KBs): per batch, each DISTINCT word is tokenized once
  (memoized) and reused — the Zipf distribution makes the per-batch
  distinct set tiny relative to rows.

Determinism: pair selection is (count desc, pair asc) — byte-stable
across runs and partitionings; ties never depend on dict order.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word sentinel (classic BPE: lets merges distinguish suffixes)
EOW = "</w>"


def word_freq_table(docs: DataFrame, text_col: str = "text",
                    vocab_cap: int = 4096) -> list[tuple[str, int]]:
    """(word, count) for the top-``vocab_cap`` words — the bounded train
    set. One shuffle; the collect is capped by construction."""
    w = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("word")
    rows = (
        docs.select(w)
        .filter(F.length("word") > 0)
        .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(vocab_cap)
        .collect()
    )
    return [(r.word, int(r.n)) for r in rows]


def train_merges(freqs: list[tuple[str, int]],
                 n_merges: int = 32) -> list[tuple[str, str]]:
    """Classic greedy BPE on a word-frequency table (driver-side, the
    train set is capped). Returns the ordered merge list."""
    words = {w: (list(w) + [EOW], n) for w, n in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        # deterministic: count desc, pair lexicographic asc
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, (syms, n) in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = (out, n)
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the merge list to one word (training-identical semantics:
    merges replayed in trained order, leftmost-first within each)."""
    syms = list(word) + [EOW]
    for a, b in merges:
        if len(syms) < 2:
            break
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def token_count_udf(merges: list[tuple[str, str]]):
    """Arrow-batched: array<string> words -> bigint BPE token count, with
    per-batch memoization over distinct words (Zipf makes the distinct
    set small; each distinct word tokenizes once per batch)."""

    @F.pandas_udf("long")
    def run(words: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def count(ws):
            total = 0
            for w in ws:
                c = memo.get(w)
                if c is None:
                    c = memo[w] = len(encode_word(w, merges))
                total += c
            return total

        return words.map(count)

    return run
