"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The canonical LLM-tokenizer training loop, Ray-Data-first:

1. **Word counting** (the only corpus-scale pass): one distributed
   groupby-sum over whitespace tokens. Everything after operates on the
   WORD-FREQUENCY table — the standard trick (HF tokenizers does the
   same) that makes merge learning independent of corpus size: 100 TB of
   text with a 10 M-type vocabulary trains on the 10 M-row table.
2. **Merge iterations**: per iteration, one distributed pair-count
   (map-side vectorized adjacent-pair emission over the symbol-sequence
   table + a groupby-sum bounded by pair-type cardinality), a driver
   argmax with a DETERMINISTIC tiebreak (count desc, then lexicographic
   (left, right) asc), and a broadcast map-side rewrite of the symbol
   sequences (greedy leftmost-non-overlapping, the BPE standard). The
   symbol table re-materializes per iteration — bounded by vocabulary
   size, never by corpus size.

Semantics follow the original Sennrich et al. 2016 algorithm (pair counts
weighted by word frequency, merges learned greedily); tests assert exact
equality of the learned merge list against an independent pure-Python
reference implementation on the same word counts.

Reference parity: the iterate-until-fixpoint driver loop with
re-materialized bounded state mirrors the engine's PageRank/k-means shape
(the reference's finish-scope iteration idiom,
``/root/reference/examples/cholesky/cholesky.c:205-257`` — sequenced
rounds over a persistent tile table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# end-of-word marker, appended to each word's last symbol so merges cannot
# cross word boundaries and word-final units stay distinct (Sennrich 2016)
EOW = "</w>"


def word_counts(ds, *, text_col: str = "text"):
    """Corpus pass: whitespace-token counts as a Dataset (word, n)."""
    from ocr_ray.functions import text as textfn

    def partial(t: pa.Table) -> pa.Table:
        _, _, flat = textfn.split_tokens(t[text_col])
        df = pd.DataFrame({"word": flat.to_pylist()})
        red = df.groupby("word", as_index=False).size()
        return pa.table(
            {
                "word": pa.array(red["word"], type=pa.string()),
                "n": pa.array(red["size"].to_numpy(dtype=np.int64)),
            }
        )

    from ocr_ray.functions.relational import bucketed_aggregate

    # per-word: vocabulary scales with the corpus -> bucketed fold
    return bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["word"],
        aggs={"n": ("n", "sum")},
    )


def _to_symbol_table(t: pa.Table) -> pa.Table:
    """(word, n) -> (n, syms: list<string>) initial character sequences."""
    words = t["word"].to_pylist()
    syms = [list(w[:-1]) + [w[-1] + EOW] if w else [] for w in words]
    return pa.table(
        {
            "n": t["n"],
            "syms": pa.array(syms, type=pa.list_(pa.string())),
        }
    )


def _pair_partial(t: pa.Table) -> pa.Table:
    """Vectorized adjacent-pair emission: flatten every word's symbol list,
    pair (i, i+1) within the same word, weight by word count, and reduce
    batch-locally before the shuffle."""
    syms = t["syms"].combine_chunks() if isinstance(t["syms"], pa.ChunkedArray) else t["syms"]
    flat = np.asarray(syms.flatten().to_pylist(), dtype=object)
    offs = syms.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offs)
    owner = np.repeat(np.arange(t.num_rows), lens)
    if len(flat) == 0:
        return pa.table(
            {
                "left": pa.array([], type=pa.string()),
                "right": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    same = owner[:-1] == owner[1:]
    wcnt = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    df = pd.DataFrame(
        {
            "left": flat[:-1][same],
            "right": flat[1:][same],
            "cnt": wcnt[owner[:-1][same]],
        }
    )
    red = df.groupby(["left", "right"], as_index=False)["cnt"].sum()
    return pa.table(
        {
            "left": pa.array(red["left"], type=pa.string()),
            "right": pa.array(red["right"], type=pa.string()),
            "cnt": pa.array(red["cnt"].to_numpy(dtype=np.int64)),
        }
    )


def best_pair(sym_ds, *, shuffle: bool = True) -> tuple[str, str, int] | None:
    """Distributed pair count -> (left, right, count) argmax with the
    deterministic tiebreak (count desc, left asc, right asc).

    ``shuffle=False`` skips the bucketed fold and sums the per-block
    partial counts on the driver: a global TOP-1 never needed an
    all-to-all — per-block combiners bound what the driver sees by
    pair-type cardinality (vocabulary-scale, not corpus-scale). The
    caller gates on the symbol table's size: at a vocabulary too big for
    a driver fold the shuffled path stands."""
    from ocr_ray.functions.relational import bucketed_aggregate

    if not shuffle:
        parts = sym_ds.map_batches(_pair_partial, batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            return None
        red = parts.groupby(["left", "right"], as_index=False)["cnt"].sum()
        top = red.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
        ).head(1)
        return str(top["left"].iloc[0]), str(top["right"].iloc[0]), int(top["cnt"].iloc[0])

    counts = bucketed_aggregate(
        sym_ds.map_batches(_pair_partial, batch_format="pyarrow"),
        keys=["left", "right"],
        aggs={"cnt": ("cnt", "sum")},
    )

    def local_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["left", "right", "cnt"])
        # Arrow-native partial top-1 (keys form a unique total order, so no
        # stability concern); avoids a pandas round trip per batch.
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("cnt", "descending"),
                ("left", "ascending"),
                ("right", "ascending"),
            ],
        )
        return t.select(["left", "right", "cnt"]).take(idx[:1])

    top = counts.map_batches(local_best, batch_format="pyarrow").to_pandas()
    if len(top) == 0:
        return None
    top = top.sort_values(
        ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
    ).head(1)
    return str(top["left"].iloc[0]), str(top["right"].iloc[0]), int(top["cnt"].iloc[0])


def merge_pair_rows(syms_list: list[list[str]], left: str, right: str) -> list[list[str]]:
    """Greedy leftmost-non-overlapping merge of (left, right) -> left+right
    in each symbol sequence (loop only over HIT positions, not symbols)."""
    merged = left + right
    out = []
    for s in syms_list:
        if len(s) < 2:
            out.append(s)
            continue
        a = np.asarray(s, dtype=object)
        hit = np.flatnonzero((a[:-1] == left) & (a[1:] == right))
        if len(hit) == 0:
            out.append(s)
            continue
        # greedy leftmost-non-overlapping: take a hit iff it does not
        # overlap the previously taken one (hits are sorted positions)
        keep: list[int] = []
        last = -2
        for h in hit:
            if h >= last + 2:
                keep.append(int(h))
                last = int(h)
        # rebuild: positions in `keep` collapse (i, i+1) -> merged
        res: list[str] = []
        ki = 0
        i = 0
        n = len(s)
        kset = keep
        while i < n:
            if ki < len(kset) and i == kset[ki]:
                res.append(merged)
                i += 2
                ki += 1
            else:
                res.append(s[i])
                i += 1
        out.append(res)
    return out


def _apply_merge(t: pa.Table, *, left: str, right: str) -> pa.Table:
    syms = t["syms"].combine_chunks() if isinstance(t["syms"], pa.ChunkedArray) else t["syms"]
    new = merge_pair_rows(syms.to_pylist(), left, right)
    return pa.table(
        {"n": t["n"], "syms": pa.array(new, type=pa.list_(pa.string()))}
    )


def bpe_train(
    ds,
    *,
    num_merges: int,
    text_col: str = "text",
    verify: bool = False,
    return_word_counts: bool = False,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over a text Dataset. Returns the
    merge table (rank, left, right, pair_count) — the tokenizer artifact.

    ``verify=True`` replays training with the independent pure-Python
    reference on the SAME word-count table (vocabulary-bounded, so the
    driver-side replay is cheap at any corpus scale — the corpus pass is
    not repeated) and raises if the learned merges differ: a
    driver-visible exactness check for a pipeline no SQL oracle can
    express."""
    wc = word_counts(ds, text_col=text_col)
    wc_dict: dict[str, int] | None = None
    if verify or return_word_counts:
        wc = wc.materialize()  # one corpus pass feeds both consumers
        wdf = wc.to_pandas()
        wc_dict = dict(zip(wdf["word"].astype(str), wdf["n"].astype(int)))
    sym = wc.map_batches(_to_symbol_table, batch_format="pyarrow").materialize()
    # Size gate (same auto_join-style discipline): the symbol table is
    # vocabulary-bounded. When it fits the driver comfortably (<256 MB),
    # the WHOLE merge loop runs driver-side on one collected Arrow table
    # with the same vectorized kernels (_pair_partial counting,
    # merge_pair_rows rewrite, identical tiebreak) — one collect instead
    # of 2 Dataset executions PER merge (24 executions for a 12-merge
    # fit, ~2s of pure dispatch at sf0.1). At a vocabulary too big for
    # the driver the distributed per-iteration path below stands.
    try:
        small_vocab = (sym.size_bytes() or 0) < (256 << 20)
    except Exception:
        small_vocab = False

    merges = []
    if small_vocab:
        sym_tbl = pa.concat_tables(
            [t for t in ray.get(sym.to_arrow_refs()) if t.num_rows],
            promote_options="default",
        ) if sym.count() else pa.table(
            {"n": pa.array([], pa.int64()), "syms": pa.array([], pa.list_(pa.string()))}
        )
        for rank in range(num_merges):
            parts = _pair_partial(sym_tbl).to_pandas()
            if len(parts) == 0:
                break
            red = parts.groupby(["left", "right"], as_index=False)["cnt"].sum()
            top = red.sort_values(
                ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
            ).head(1)
            left, right, cnt = (
                str(top["left"].iloc[0]),
                str(top["right"].iloc[0]),
                int(top["cnt"].iloc[0]),
            )
            if cnt < 2:
                break
            merges.append((rank + 1, left, right, cnt))
            sym_tbl = _apply_merge(sym_tbl, left=left, right=right)
    else:
        for rank in range(num_merges):
            best = best_pair(sym, shuffle=True)
            if best is None or best[2] < 2:
                break
            left, right, cnt = best
            merges.append((rank + 1, left, right, cnt))
            sym = sym.map_batches(
                _apply_merge, batch_format="pyarrow", fn_kwargs={"left": left, "right": right}
            ).materialize()  # bounded by vocabulary size, not corpus size
    out = pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])
    if verify:
        ref = bpe_train_reference(wc_dict or {}, num_merges)
        got = [(l, r, c) for _, l, r, c in out.itertuples(index=False)]
        if got != ref:
            raise RuntimeError(
                "bpe_train verify failed: distributed merges "
                f"{got[:3]}...({len(got)}) != reference {ref[:3]}...({len(ref)})"
            )
    if return_word_counts:
        # callers building a gate_ok column replay the reference on the
        # SAME (materialized above) word-count table — no second corpus pass
        return out, wc_dict
    return out


def bpe_train_reference(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, str, int]]:
    """Independent pure-Python reference (Sennrich-style) for tests."""
    vocab = {tuple(list(w[:-1]) + [w[-1] + EOW]): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), cnt = best
        if cnt < 2:
            break
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            s = list(syms)
            res = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            key = tuple(res)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


class BpeEncoder:
    """Stateful actor-pool encode stage: apply a learned merge list to text.

    The transform half of the tokenizer (``bpe_train`` is the fit half):
    construct with the small merge table (broadcast once per actor via the
    actor-pool ``fn_constructor_kwargs`` — never re-shipped per batch), and
    ``__call__`` tokenizes each word by replaying the merges in rank order
    with the same greedy leftmost-non-overlapping rule used in training.
    A per-actor word→token-count cache makes the cost proportional to the
    batch's UNIQUE word types, not its tokens — the same
    vocabulary-not-corpus bound as training."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = [(str(left), str(right)) for left, right in merges]
        self.cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        syms = list(word[:-1]) + [word[-1] + EOW]
        for left, right in self.merges:
            if len(syms) < 2:
                break
            syms = merge_pair_rows([syms], left, right)[0]
        # losslessness invariant: subword units concatenate back to the
        # word (+ end marker). Costs O(len) once per UNIQUE word (cached);
        # catches any merge-application corruption at run time.
        if "".join(syms) != word + EOW:
            raise RuntimeError(
                f"BPE encode roundtrip failed for word {word!r}: {syms!r}"
            )
        n = len(syms)
        self.cache[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            total = 0
            for w in (txt or "").split(" "):
                if w:
                    total += self._n_tokens(w)
            out[i] = total
        cols = {name: t[name] for name in t.schema.names if name != "text"}
        cols["n_bpe_tokens"] = pa.array(out)
        return pa.table(cols)


def bpe_encode_reference(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent pure-Python single-word encoder for tests (same greedy
    leftmost-non-overlapping semantics, written without merge_pair_rows)."""
    syms = list(word[:-1]) + [word[-1] + EOW]
    for left, right in merges:
        res: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms
