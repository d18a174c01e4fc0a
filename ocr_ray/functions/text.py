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


def classify_hashed(batch: pa.Table, *, num_classes: int = 8) -> pa.Table:
    """Hashed-feature linear classifier — the engine's batched
    model-scoring stage, with weights derived arithmetically so the whole
    model is oracle-expressible (no weight table to ship or drift):

        w_c(token) = mix64(hash(token) + (c+1) * 0x9E3779B97F4A7C15) % 1001 - 500
        score(doc, c) = sum over token OCCURRENCES of w_c(token)
        label(doc) = argmax_c score  (tie -> smallest class id)

    All int64/uint64 wraparound arithmetic, so numpy and the DuckDB
    HUGEINT split-multiply oracle agree bit-for-bit — FOR ASCII text and
    the default ``num_classes=8`` only: the Python side hashes UTF-8
    BYTES while the SQL chars CTE hashes code points (same caveat as
    ``doc_fingerprint``), and the registered oracle hard-codes 8 classes.
    NULL-text rows are dropped, matching the oracle's unnest behavior.
    Vectorized as one pass per class over the DISTINCT token hashes
    (weights gathered back by inverse index — per-class passes, not an
    (N, C) matrix; the host's fresh-large-allocation stalls make wide
    temporaries pathological; see ``hashing.hash_utf8_column``).

    Stand-in for a real classifier head: swap ``w_c`` for learned weights
    broadcast via ``ray.put`` and the distributed shape (stateless
    map_batches, zero shuffles) is unchanged.
    """
    from ocr_ray.functions.dedup import _word_hashes
    from ocr_ray.functions.hashing import mix64

    valid = pc.is_valid(batch["text"])
    if not pc.all(valid).as_py():
        batch = batch.filter(valid)  # NULL text vanishes from the oracle's unnest
    n = batch.num_rows
    id_type = batch.schema.field("doc_id").type
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=id_type),
                "label": pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.int64()),
            }
        )
    _, counts, flat = split_tokens(batch["text"])
    h = _word_hashes(flat)
    # weights per DISTINCT token hash, gathered back — token occurrences
    # repeat heavily, so the mix64 chains run on the vocabulary only
    h_u, inv = np.unique(h, return_inverse=True)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    best_score = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
    best_c = np.zeros(n, dtype=np.int64)
    gold = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for c in range(num_classes):
            w_u = (mix64(h_u + np.uint64(c + 1) * gold) % np.uint64(1001)).astype(
                np.int64
            ) - 500
            s = np.add.reduceat(w_u[inv], starts)
            better = s > best_score
            best_score = np.where(better, s, best_score)
            best_c = np.where(better, c, best_c)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "label": pa.array(best_c),
            "score": pa.array(best_score),
        }
    )


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


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition quality signals, fully vectorized.

    Per doc: ``n_tokens``, ``n_distinct`` (distinct whitespace tokens),
    ``dup_word_frac`` (1 - distinct/total — high for boilerplate and
    keyword-stuffed pages) and ``top_bigram_frac`` (count of the most
    frequent bigram over the bigram total — high for templated spam).
    Token identity runs over u64 content hashes (one lexsort + run
    counting, no per-row Python); the SQL oracle computes the same
    fractions on the token strings themselves.
    """
    from ocr_ray.functions.hashing import hash_utf8_column, mix64

    parents, counts, flat = split_tokens(batch["text"])
    n = batch.num_rows
    nt = counts
    h = hash_utf8_column(flat)
    parents = parents.astype(np.int64)

    # distinct tokens per doc: sort (parent, hash), count run starts per doc
    order = np.lexsort((h, parents))
    hs, ps = h[order], parents[order]
    nd = np.zeros(n, dtype=np.int64)
    if len(hs):
        new = np.empty(len(hs), dtype=bool)
        new[0] = True
        new[1:] = (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])
        nd = np.bincount(ps[new], minlength=n).astype(np.int64)

    # most-frequent-bigram count per doc
    maxbi = np.zeros(n, dtype=np.int64)
    if len(parents) > 1:
        same = parents[:-1] == parents[1:]
        bp = parents[:-1][same]
        with np.errstate(over="ignore"):
            bh = mix64(h[:-1][same] * np.uint64(0x9E3779B97F4A7C15) + h[1:][same])
        if len(bp):
            o2 = np.lexsort((bh, bp))
            bh, bp = bh[o2], bp[o2]
            newr = np.empty(len(bh), dtype=bool)
            newr[0] = True
            newr[1:] = (bh[1:] != bh[:-1]) | (bp[1:] != bp[:-1])
            run_start = np.flatnonzero(newr)
            run_len = np.diff(np.append(run_start, len(bh)))
            run_parent = bp[run_start]
            doc_new = np.empty(len(run_parent), dtype=bool)
            doc_new[0] = True
            doc_new[1:] = run_parent[1:] != run_parent[:-1]
            doc_start = np.flatnonzero(doc_new)
            maxbi[run_parent[doc_start]] = np.maximum.reduceat(run_len, doc_start)

    ntf = nt.astype(np.float64)
    dup_frac = 1.0 - nd.astype(np.float64) / ntf
    nbi = nt - 1
    top_bi = np.where(nbi > 0, maxbi.astype(np.float64) / np.maximum(nbi, 1).astype(np.float64), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(nt),
            "n_distinct": pa.array(nd),
            "dup_word_frac": pa.array(dup_frac),
            "top_bigram_frac": pa.array(top_bi),
        }
    )


# PII patterns — shared by the Ray kernel and the DuckDB oracle (both RE2).
PII_EMAIL = r"[A-Za-z0-9_.]+@[A-Za-z0-9.]+"
PII_PHONE = r"555-[0-9]{4}"
PII_IP = r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+"


def pii_augment(batch: pa.Table) -> pa.Table:
    """Deterministically seed PII into the synthetic corpus (arithmetic on
    doc_id, mirrored verbatim by the oracle SQL): every 3rd doc gains an
    email, every 5th a phone number, every 7th an IPv4 address."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    dstr = pc.cast(batch["doc_id"], pa.string())
    email = pc.binary_join_element_wise(
        pa.scalar(" contact user"), dstr, pa.scalar("@example.com now"), ""
    )
    phone = pc.binary_join_element_wise(
        pa.scalar(" call 555-"),
        pc.utf8_lpad(pc.cast(pa.array(ids % 10000), pa.string()), width=4, padding="0"),
        "",
    )
    ip = pc.binary_join_element_wise(
        pa.scalar(" from 10."),
        pc.cast(pa.array(ids % 256), pa.string()),
        pa.scalar("."),
        pc.cast(pa.array(ids * 7 % 256), pa.string()),
        pa.scalar("."),
        pc.cast(pa.array(ids * 13 % 256), pa.string()),
        "",
    )
    empty = pa.scalar("")
    aug = pc.binary_join_element_wise(
        batch["text"],
        pc.if_else(pa.array(ids % 3 == 0), email, empty),
        pc.if_else(pa.array(ids % 5 == 0), phone, empty),
        pc.if_else(pa.array(ids % 7 == 0), ip, empty),
        "",
    )
    return batch.set_column(batch.column_names.index("text"), "text", aug)


def pii_redact(batch: pa.Table) -> pa.Table:
    """Scrub emails / phone numbers / IPv4 addresses (RE2, all
    occurrences) and count what was removed."""
    text = batch["text"]
    counts = {
        "n_emails": pc.cast(pc.count_substring_regex(text, PII_EMAIL), pa.int64()),
        "n_phones": pc.cast(pc.count_substring_regex(text, PII_PHONE), pa.int64()),
        "n_ips": pc.cast(pc.count_substring_regex(text, PII_IP), pa.int64()),
    }
    red = pc.replace_substring_regex(text, PII_EMAIL, replacement="<EMAIL>")
    red = pc.replace_substring_regex(red, PII_PHONE, replacement="<PHONE>")
    red = pc.replace_substring_regex(red, PII_IP, replacement="<IP>")
    return pa.table(
        {"doc_id": batch["doc_id"], "redacted": red, **counts}
    )
