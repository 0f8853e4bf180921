"""Unigram-LM subword tokenizer — train (Viterbi-EM) + distributed apply.

The second real subword pipeline next to BPE (functions/bpe.py): the
unigram language model of Kudo, "Subword Regularization" (ACL 2018) —
the SentencePiece default. Where BPE BUILDS tokens bottom-up by merging,
the unigram model starts from an overcomplete piece inventory and keeps
the pieces a probabilistic segmentation actually uses.

Scale contract — the SAMPLED-FIT pattern shared with BPE/PQ/IVF:

- TRAIN sees the word FREQUENCY TABLE, not the corpus: the same capped
  (word, count) table BPE trains from (one distributed
  split+explode+groupBy, bounded TakeOrdered collect). Seeding +
  EM iterations run on the driver over <= vocab_cap words.
- This implementation uses hard-EM (Viterbi-EM): the E-step assigns each
  word its single best segmentation under the current piece
  probabilities and accumulates INTEGER counts (piece count x word
  frequency); the M-step renormalizes. SentencePiece's soft-EM
  (forward-backward) differs only in using expected counts; hard-EM is
  the standard deterministic approximation and keeps every accumulated
  count an exact integer.
- APPLY is an Arrow-batched pandas UDF, per-batch memoized per DISTINCT
  word, identical to the BPE apply contract.

Determinism: seeding ranks substrings by (count desc, piece asc);
Viterbi ties resolve to FEWER pieces, then the lexicographically
smallest piece at the split point — byte-stable across runs and
partitionings, never dict-order-dependent.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import functions as F

#: pieces longer than this never seed (SentencePiece's
#: max_sentencepiece_length analog, small because the capped word table
#: tops out at short words)
MAX_PIECE_LEN = 6


def seed_pieces(freqs: list[tuple[str, int]], vocab_cap: int = 256,
                max_piece_len: int = MAX_PIECE_LEN) -> dict[str, int]:
    """Overcomplete seed inventory: every substring of length <=
    max_piece_len, counted weighted by word frequency; ALL single
    characters are kept unconditionally (segmentation must never fail),
    the rest is the top of the (count desc, piece asc) ranking."""
    counts: dict[str, int] = {}
    chars: set[str] = set()
    for word, n in freqs:
        chars.update(word)
        for i in range(len(word)):
            for j in range(i + 1, min(i + max_piece_len, len(word)) + 1):
                p = word[i:j]
                counts[p] = counts.get(p, 0) + n
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )
    keep = {c: counts.get(c, 1) for c in chars}
    for p, c in multi[: max(0, vocab_cap - len(keep))]:
        keep[p] = c
    return keep


def _logp(counts: dict[str, int]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items()}


def viterbi(word: str, logp: dict[str, float],
            max_piece_len: int = MAX_PIECE_LEN) -> list[str]:
    """Single best segmentation under the piece log-probs. DP over end
    positions; ties resolve to fewer pieces, then the lexicographically
    smallest final piece. Characters missing from the vocab segment as
    themselves with a floor score (unk behavior — segmentation never
    fails)."""
    floor = min(logp.values(), default=0.0) - 10.0
    n = len(word)
    # best[i] = (score, n_pieces, last_piece) for word[:i]
    best: list[tuple[float, int, str]] = [(0.0, 0, "")] + [None] * n  # type: ignore
    for i in range(1, n + 1):
        cand = None
        for l in range(1, min(max_piece_len, i) + 1):
            piece = word[i - l:i]
            prev = best[i - l]
            if prev is None:
                continue
            s = logp.get(piece)
            if s is None:
                if l != 1:
                    continue
                s = floor
            key = (prev[0] + s, -(prev[1] + 1), piece)
            # maximize score; tie -> fewer pieces; tie -> smallest piece
            if cand is None or (key[0], key[1]) > (cand[0][0], cand[0][1]) or (
                (key[0], key[1]) == (cand[0][0], cand[0][1]) and key[2] < cand[0][2]
            ):
                cand = (key, l)
        best[i] = (cand[0][0], -cand[0][1], cand[0][2])
    pieces: list[str] = []
    i = n
    while i > 0:
        p = best[i][2]
        pieces.append(p)
        i -= len(p)
    return pieces[::-1]


def train_unigram(freqs: list[tuple[str, int]], vocab_cap: int = 256,
                  n_iters: int = 3,
                  max_piece_len: int = MAX_PIECE_LEN) -> dict[str, float]:
    """Hard-EM over the capped word-frequency table: E-step Viterbi-
    segments every word and accumulates integer counts (piece use x word
    frequency); M-step renormalizes; unused multi-char pieces are pruned
    (single chars survive with count 1 so coverage never breaks).
    Returns the final piece log-probs."""
    counts = seed_pieces(freqs, vocab_cap, max_piece_len)
    for _ in range(n_iters):
        logp = _logp(counts)
        used: dict[str, int] = {}
        for word, n in freqs:
            for piece in viterbi(word, logp, max_piece_len):
                used[piece] = used.get(piece, 0) + n
        counts = {
            p: used.get(p, 1 if len(p) == 1 else 0) for p in counts
        }
        counts = {p: c for p, c in counts.items() if c > 0}
    return _logp(counts)


def token_count_udf(logp: dict[str, float],
                    max_piece_len: int = MAX_PIECE_LEN):
    """pandas UDF: unigram piece count per word array, memoized per
    DISTINCT word within the batch (the BPE apply contract — Zipf makes
    the distinct set small)."""

    @F.pandas_udf("long")
    def count_pieces(words: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def one(ws) -> int:
            total = 0
            for w in ws:
                if not w:
                    continue
                k = memo.get(w)
                if k is None:
                    k = len(viterbi(w, logp, max_piece_len))
                    memo[w] = k
                total += k
            return total

        return words.map(one)

    return count_pieces
