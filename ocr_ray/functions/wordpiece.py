"""WordPiece-style subword ENCODING: greedy longest-match-first.

The complement of ``functions/bpe.py``: BPE encodes by replaying merge
order; WordPiece encodes by scanning each word left-to-right and taking
the LONGEST vocabulary token that prefixes the remainder (continuation
pieces carry the ``##`` marker). The two algorithms segment the same
vocabulary differently — shipping both is what lets a corpus pipeline
reproduce either tokenizer family's token counts.

Vocabulary derivation is deterministic from a trained BPE merge list:
every single character seen in the merges plus every merged string, in
both word-start and ``##``-continuation form (single characters outside
the merge alphabet enter the vocab on sight — the corpus alphabet is
part of the vocab by construction, so encoding is total and lossless;
``[UNK]`` handling is still implemented and unit-tested for vocabularies
that do not cover the text).

Scale shape: the vocab is a broadcast-once constructor argument of an
actor-pool ``map_batches`` stage (same contract as ``BpeEncoder``); a
per-actor word→pieces cache bounds work by unique word TYPES per batch,
and the greedy scan is bounded by the longest vocab token, not the word
length.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

UNK = "[UNK]"


def wordpiece_vocab(merges: list[tuple[str, str]], *, extra_chars: str = "") -> set[str]:
    """Deterministic vocab from a BPE merge list: all participating
    single characters and every merged string (word-start form); the
    encoder derives continuation forms itself. ``extra_chars`` lets a
    caller add the corpus alphabet explicitly."""
    vocab: set[str] = set(extra_chars)
    for left, right in merges:
        for tok in (left, right, left + right):
            vocab.add(tok)
            vocab.update(tok)  # single characters of every token
    return vocab


def wordpiece_encode_reference(word: str, vocab: set[str]) -> list[str]:
    """Plain-Python greedy longest-match-first WordPiece encode — the
    independent reference the distributed encoder is asserted against."""
    if not word:
        return []
    pieces: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        end = n
        found = None
        while end > pos:
            sub = word[pos:end]
            probe = sub if pos == 0 else "##" + sub
            cand = sub  # vocab stores start-form strings; continuation
            # membership is the same string (the ## is presentation)
            if cand in vocab:
                found = probe
                break
            end -= 1
        if found is None:
            return [UNK]
        pieces.append(found)
        pos = end
    return pieces


class WordpieceEncoder:
    """Actor-pool encode stage: ``(doc_id, text)`` -> one row per doc with
    its WordPiece piece count and UNK count.

    The vocab ships once per actor as a constructor argument; a word→
    (n_pieces, is_unk) cache amortizes repeated word types; the greedy
    scan caps candidate length at the longest vocab token (the ``##``
    marker is presentation — membership is on the raw substring, matching
    ``wordpiece_encode_reference``).

    Runtime exactness gate (the op has no SQL oracle — greedy matching is
    not SQL-expressible): every word whose CRC-32 lands in the
    deterministic ``1/verify_mod`` sample is re-encoded with the plain-Python reference
    scanner (no length cap, no cache — an independent code path) and a
    count mismatch raises. Full-coverage comparison lives in the unit
    tests; the in-flight sample keeps the same guarantee live on real
    corpus data at bounded cost.
    """

    def __init__(self, vocab: set[str], *, verify_mod: int = 16):
        self.vocab = frozenset(vocab)
        self.max_len = max((len(v) for v in self.vocab), default=1)
        self.cache: dict[str, tuple[int, int]] = {}
        self.verify_mod = int(verify_mod)

    def _encode_counts(self, word: str) -> tuple[int, int]:
        """(n_pieces, n_unk) of one word."""
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        pos, n = 0, len(word)
        n_pieces = 0
        out: tuple[int, int]
        while pos < n:
            end = min(n, pos + self.max_len)
            while end > pos and word[pos:end] not in self.vocab:
                end -= 1
            if end == pos:
                out = (1, 1)  # [UNK] replaces the whole word
                break
            n_pieces += 1
            pos = end
        else:
            out = (n_pieces, 0)
        if self.verify_mod and zlib.crc32(word.encode()) % self.verify_mod == 0:
            ref = wordpiece_encode_reference(word, self.vocab)
            ref_counts = (len(ref), int(UNK in ref))
            if ref_counts != out:
                raise AssertionError(
                    f"wordpiece divergence on {word!r}: engine {out}, "
                    f"reference {ref_counts}"
                )
        self.cache[word] = out
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_pieces = np.zeros(len(texts), dtype=np.int64)
        n_unk = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            total = unk = 0
            for word in (text or "").split(" "):
                if not word:
                    continue
                p, u = self._encode_counts(word)
                total += p
                unk += u
            n_pieces[i] = total
            n_unk[i] = unk
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_pieces": pa.array(n_pieces),
                "n_unk": pa.array(n_unk),
            }
        )
