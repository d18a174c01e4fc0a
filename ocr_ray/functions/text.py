"""Text-analysis kernels over document batches (vectorized).

Language-ID (stopword heuristic), quality scoring, token counting and
document fingerprinting for training-data pipelines. All kernels work on
a flattened token stream (`pc.split_pattern` + `list_parent_indices`)
instead of Python loops over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to", "in"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "de": ("der", "die", "und", "das", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "zh": ("de", "shi", "le", "zai", "he", "you"),
}

FINGERPRINT_BASE = np.uint64(1_000_003)


def split_tokens(text_col) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """Split a string column on single spaces.

    Returns ``(parent_row_index, token_counts_per_row, flat_tokens)``.
    """
    toks = pc.split_pattern(text_col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    return parents, counts, pc.list_flatten(toks)


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_chars_measured, avg_token_len."""
    _, counts, flat = split_tokens(batch["text"])
    n_chars = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts),
            "n_chars_measured": pa.array(n_chars),
            "avg_token_len": pa.array(
                (n_chars - (counts - 1)).astype(np.float64) / counts.astype(np.float64)
            ),
        }
    )


def stopword_counts(batch: pa.Table, *, words: tuple[str, ...]) -> np.ndarray:
    """Per-row count of tokens exactly matching any of ``words``."""
    parents, counts, flat = split_tokens(batch["text"])
    hit = pc.is_in(flat, value_set=pa.array(list(words))).to_numpy(zero_copy_only=False)
    out = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(out, parents[hit], 1)
    return out


def quality_score(batch: pa.Table) -> pa.Table:
    """Per-doc quality heuristics: doc_id, n_tokens, stop_ratio_en,
    mean_token_len, quality (composite in [0,1])."""
    parents, counts, flat = split_tokens(batch["text"])
    n_stop = stopword_counts(batch, words=STOPWORDS["en"])
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
    sum_len = np.zeros(batch.num_rows, dtype=np.float64)
    np.add.at(sum_len, parents, tok_lens)
    mean_len = sum_len / np.maximum(counts, 1)
    stop_ratio = n_stop.astype(np.float64) / np.maximum(counts, 1)
    length_term = np.clip(counts / 64.0, 0.0, 1.0)
    len_term = np.clip(1.0 - np.abs(mean_len - 5.0) / 5.0, 0.0, 1.0)
    quality = 0.4 * length_term + 0.3 * np.clip(stop_ratio * 5, 0, 1) + 0.3 * len_term
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts),
            "stop_ratio_en": pa.array(stop_ratio),
            "mean_token_len": pa.array(mean_len),
            "quality": pa.array(quality),
        }
    )


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-vote language ID: doc_id, pred_lang, vote counts per lang.

    Deterministic tie-break: highest count, then language code ascending.
    """
    langs = sorted(STOPWORDS)
    votes = np.stack([stopword_counts(batch, words=STOPWORDS[lg]) for lg in langs], axis=1)
    # argmax with lexicographic tiebreak on language code (langs sorted).
    best = np.argmax(votes, axis=1)
    pred = np.array(langs, dtype=object)[best]
    cols = {"doc_id": batch["doc_id"], "pred_lang": pa.array(pred, type=pa.string())}
    for i, lg in enumerate(langs):
        cols[f"votes_{lg}"] = pa.array(votes[:, i])
    return pa.table(cols)


def fingerprint(batch: pa.Table) -> pa.Table:
    """Polynomial rolling-hash (Rabin-style) fingerprint of each doc's text.

    fp = sum(byte_i * BASE^i) mod 2^64 — fully vectorized: one
    ``frombuffer`` over the batch's concatenated UTF-8 bytes, a shared
    power table, and a segmented ``np.add.reduceat``. uint64 wraparound is
    the modulus, so no Python-per-byte arithmetic.
    """
    lens = (
        pc.binary_length(pc.cast(batch["text"], pa.binary()))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    blob = "".join(batch["text"].to_pylist()).encode("utf-8")
    data = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    max_len = int(lens.max()) if len(lens) else 0
    powers = np.ones(max(max_len, 1), dtype=np.uint64)
    if max_len > 1:
        powers[1:] = FINGERPRINT_BASE
        with np.errstate(over="ignore"):
            powers = np.cumprod(powers, dtype=np.uint64)
    pos = np.arange(len(data), dtype=np.int64) - np.repeat(bounds[:-1], lens)
    with np.errstate(over="ignore"):
        terms = data * powers[pos]
    nonempty = lens > 0
    fps = np.zeros(batch.num_rows, dtype=np.uint64)
    if len(data):
        # reduceat needs strictly valid start indices; empty docs get 0.
        starts = bounds[:-1][nonempty]
        fps[nonempty] = np.add.reduceat(terms, starts)
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, type=pa.uint64())})


def token_windows(
    batch: pa.Table,
    *,
    window: int = 32,
    stride: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """Fixed-size token windows with overlap — the training-data chunking
    stage (context-window packing). Emits one row per window:
    ``(id, win_start, chunk, n_tokens)`` where ``chunk`` is tokens
    ``[win_start, win_start+window)`` joined by spaces.

    Window starts are every ``stride`` tokens while they add new tokens
    (a trailing window fully covered by the previous one is skipped):
    ``starts = range(0, max(n_tokens - window + stride, 1), stride)``.

    Fully vectorized: chunks are BYTE SLICES of the original text (token
    boundaries are single spaces, so byte offsets follow from token
    lengths) gathered with one variable-length numpy index — no Python
    per window. Assumes single-space-separated tokens, which also makes
    the output equal to SQL's ``array_to_string(words[a:b], ' ')``.
    """
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    toks = pc.split_pattern(texts, " ")
    n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    tok_len = pc.binary_length(pc.list_flatten(toks)).to_numpy(zero_copy_only=False).astype(np.int64)

    # windows per doc (empty docs still emit one empty window, matching
    # the SQL range(0, greatest(n - window + stride, 1), stride) starts)
    n_win = np.ceil(np.maximum(n_tok - window + stride, 1) / stride).astype(np.int64)
    doc_of_win = np.repeat(np.arange(n_docs, dtype=np.int64), n_win)
    win_first = np.concatenate([[0], np.cumsum(n_win)])[:-1]
    win_idx = np.arange(int(n_win.sum()), dtype=np.int64) - np.repeat(win_first, n_win)
    start_tok = win_idx * stride
    end_tok = np.minimum(start_tok + window, n_tok[doc_of_win])
    out_n_tokens = np.maximum(end_tok - start_tok, 0)

    # byte offset of each token inside its doc: cumsum of (len + 1 space)
    doc_tok_first = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
    within_start = np.zeros(len(tok_len) + 1, dtype=np.int64)
    np.cumsum(tok_len + 1, out=within_start[1:])
    # reset the running sum at doc boundaries
    base = within_start[doc_tok_first]
    tok_byte_start = within_start[:-1] - np.repeat(base, n_tok)

    buffers = texts.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    # slice-aware: a sliced array shares the parent buffers with an offset
    text_off = (
        np.frombuffer(buffers[1], dtype=off_dtype)[texts.offset : texts.offset + n_docs + 1]
    ).astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)

    g_start_tok = doc_tok_first[doc_of_win] + start_tok
    g_last_tok = doc_tok_first[doc_of_win] + end_tok - 1
    byte_start = text_off[doc_of_win] + np.where(
        out_n_tokens > 0, tok_byte_start[np.minimum(g_start_tok, len(tok_byte_start) - 1)], 0
    )
    byte_end = text_off[doc_of_win] + np.where(
        out_n_tokens > 0,
        tok_byte_start[np.maximum(g_last_tok, 0)] + tok_len[np.maximum(g_last_tok, 0)],
        0,
    )
    lens = np.maximum(byte_end - byte_start, 0)
    out_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_off[1:])
    total = int(out_off[-1])
    idx = np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], lens) + np.repeat(byte_start, lens)
    out_bytes = data[idx] if total else np.empty(0, np.uint8)
    chunk = pa.Array.from_buffers(
        pa.large_utf8(),
        len(lens),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_bytes.tobytes())],
    )
    ids = pc.take(batch[id_col], pa.array(doc_of_win))
    return pa.table(
        {
            id_col: ids,
            "win_start": pa.array(start_tok),
            "chunk": pc.cast(chunk, pa.string()),
            "n_tokens": pa.array(out_n_tokens),
        }
    )
