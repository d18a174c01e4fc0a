"""Glyph codec, segmentation and the nearest-template recognizer.

The recognition kernel re-expresses the reference's per-datum compute
kernels (e.g. the wavefront cell scorer,
``/root/reference/examples/smith-waterman/smithwaterman.c:83-196``, and the
char-class mapping normalizer, ``smithwaterman.c:25-60``) as a *batched*
feature-vector nearest-template matcher:

- every character in the glyph alphabet has a deterministic GLYPH_DIM-dim
  feature vector (the "template");
- an encoded glyph span is the concatenation of uint8-quantized feature
  vectors, one GLYPH_DIM-byte cell per character (a deterministic stand-in
  for rasterized glyph features — no image libs in this environment);
- segmentation slices the byte stream into fixed-size cells (the
  connected-component analogue);
- recognition de-quantizes each cell and takes the nearest template under
  squared Euclidean distance, computed for a whole batch of glyphs with one
  numpy matmul.

``Recognizer`` is a callable class: Ray Data runs it as an actor pool via
``map_batches(Recognizer, concurrency=N)``, so the template matrix is built
once per actor in ``__init__`` (never per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocr_ray.schema import KIND_GLYPHS, KIND_TEXT

GLYPH_DIM = 8  # feature dims per glyph == bytes per encoded glyph cell
ALPHABET_LO = 32  # ' '
ALPHABET_HI = 126  # '~'
ALPHABET_SIZE = ALPHABET_HI - ALPHABET_LO + 1
_TEMPLATE_SEED = 0x0C12


def _template_matrix() -> np.ndarray:
    """(ALPHABET_SIZE, GLYPH_DIM) float32 template features in [0, 1)."""
    rng = np.random.default_rng(_TEMPLATE_SEED)
    return rng.random((ALPHABET_SIZE, GLYPH_DIM), dtype=np.float32)


def _quantized_templates() -> np.ndarray:
    """(ALPHABET_SIZE, GLYPH_DIM) uint8 — the byte form glyphs are encoded as."""
    return np.round(_template_matrix() * 255.0).astype(np.uint8)


class GlyphCodec:
    """Deterministic text <-> glyph-byte-stream codec (corpus side).

    ``encode`` is used only by the corpus generator and the test oracle;
    the engine inverts it with the real segmentation + recognition stages.
    """

    def __init__(self) -> None:
        self.templates_q = _quantized_templates()

    def encode(self, text: str) -> bytes:
        if not text:
            return b""
        codes = np.frombuffer(text.encode("ascii", errors="replace"), dtype=np.uint8)
        codes = np.where((codes < ALPHABET_LO) | (codes > ALPHABET_HI), ord("?"), codes)
        return self.templates_q[codes - ALPHABET_LO].tobytes()


def segment_payloads(payloads: list[bytes | None]) -> tuple[np.ndarray, np.ndarray]:
    """Slice encoded byte streams into glyph cells.

    Returns ``(cells, lengths)`` where ``cells`` is a
    ``(total_glyphs, GLYPH_DIM)`` uint8 array of all glyph cells across the
    inputs (concatenated) and ``lengths[i]`` is the glyph count of input i.
    The whole batch segments with one ``frombuffer``+``reshape`` — no
    per-glyph Python.
    """
    for p in payloads:
        if p is not None and len(p) % GLYPH_DIM:
            raise ValueError(
                f"glyph payload length {len(p)} is not a multiple of "
                f"{GLYPH_DIM}; a truncated payload would silently shift "
                "every following cell"
            )
    lengths = np.fromiter(
        (0 if p is None else len(p) // GLYPH_DIM for p in payloads),
        dtype=np.int64,
        count=len(payloads),
    )
    blob = b"".join(p for p in payloads if p)
    cells = np.frombuffer(blob, dtype=np.uint8).reshape(-1, GLYPH_DIM)
    return cells, lengths


class Recognizer:
    """Actor-pool stage: decode ``kind=='glyphs'`` spans to text.

    Stateful setup (template matrix + its squared norms, the decode table)
    happens once per actor here; ``__call__`` handles one Arrow batch of
    exploded spans, leaving non-glyph rows untouched (zero-copy columns).
    """

    def __init__(self) -> None:
        self.templates = _quantized_templates().astype(np.float32) / 255.0
        self.t_norms = (self.templates**2).sum(axis=1)  # (A,)
        self.chars = np.frombuffer(
            bytes(range(ALPHABET_LO, ALPHABET_HI + 1)), dtype=np.uint8
        )


    # glyphs per matmul chunk: caps the score-matrix temp at ~12 MB so the
    # buffers are allocated once and reused — a single full-batch matmul
    # materialized (n_glyphs x ALPHABET_SIZE) float32 (hundreds of MB at
    # 4096-doc batches), and on this host FRESH large allocations
    # intermittently page-fault ~1000x slow (see functions/hashing.py).
    _CHUNK = 32768

    def recognize_cells(self, cells: np.ndarray) -> np.ndarray:
        """(n, GLYPH_DIM) uint8 cells -> (n,) uint8 character codes.

        Quantized cells have bounded cardinality (distinct glyph
        renderings, not distinct glyphs), so the batch is deduped first
        and the distance matmul runs on UNIQUE cells only — identical
        output, ~30x less arithmetic on text-like payloads where the
        same rendering repeats. Dedup key is the cell's bytes folded to
        one uint64 (GLYPH_DIM == 8)."""
        n = len(cells)
        if n == 0:
            return np.empty(0, dtype=np.uint8)
        # zero-copy byte-fold: each 8-byte cell IS a uint64 (no temp, no
        # matmul — the previous astype+matmul key allocated 8x the cells)
        key = np.ascontiguousarray(cells).view(np.uint64).ravel()
        uniq, first, inv = np.unique(key, return_index=True, return_inverse=True)
        # only dedup when it actually shrinks the matmul: near-unique
        # batches (noisy payloads) would pay gather+scatter on top of the
        # full matmul for nothing
        if len(uniq) <= n // 2:
            return self._recognize_dense(cells[first])[inv]
        return self._recognize_dense(cells)

    def _recognize_dense(self, cells: np.ndarray) -> np.ndarray:
        n = len(cells)
        if n == 0:
            return np.empty(0, dtype=np.uint8)
        out = np.empty(n, dtype=np.uint8)
        ch = min(self._CHUNK, n)
        xbuf = np.empty((ch, cells.shape[1]), dtype=np.float32)
        sbuf = np.empty((ch, ALPHABET_SIZE), dtype=np.float32)
        for s in range(0, n, ch):
            e = min(s + ch, n)
            m = e - s
            xb, sc = xbuf[:m], sbuf[:m]
            np.copyto(xb, cells[s:e], casting="unsafe")
            xb /= np.float32(255.0)
            # argmin ||x - t||^2 == argmin (t.t - 2 x.t); chunked matmul.
            np.matmul(xb, self.templates.T, out=sc)
            sc *= np.float32(-2.0)
            sc += self.t_norms[None, :]
            out[s:e] = self.chars[np.argmin(sc, axis=1)]
        return out

    def decode_payloads(self, payloads: list[bytes | None]) -> list[str]:
        cells, lengths = segment_payloads(payloads)
        codes = self.recognize_cells(cells)
        text = codes.tobytes().decode("ascii")
        bounds = np.concatenate([[0], np.cumsum(lengths)])
        return [text[bounds[i] : bounds[i + 1]] for i in range(len(lengths))]

    def decode_binary_array(self, pay: pa.Array) -> pa.Array:
        """Decode a (large_)binary array of glyph payloads to a string array
        with NO per-row Python: slice the value buffer directly, one matmul
        over all cells, rebuild the string array from raw buffers (the
        recognized bytes ARE the utf8 data; offsets are payload offsets/8)."""
        if len(pay) == 0:
            return pa.array([], type=pa.large_string())
        if pay.null_count:
            raise ValueError(
                "glyph span with NULL payload: the zero-copy decode would "
                "silently rewrite it to empty text; fix the producer or "
                "filter the row"
            )
        off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
        offs = np.frombuffer(pay.buffers()[1], dtype=off_dtype)[
            pay.offset : pay.offset + len(pay) + 1
        ].astype(np.int64)
        data = np.frombuffer(pay.buffers()[2], dtype=np.uint8)
        cells = data[offs[0] : offs[-1]].reshape(-1, GLYPH_DIM)
        codes = self.recognize_cells(cells)
        text_offs = (offs - offs[0]) // GLYPH_DIM
        return pa.Array.from_buffers(
            pa.large_utf8(),
            len(pay),
            [None, pa.py_buffer(text_offs.tobytes()), pa.py_buffer(codes.tobytes())],
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "payload" not in batch.column_names or batch.num_rows == 0:
            return batch.drop_columns(
                [c for c in ("payload",) if c in batch.column_names]
            )
        kind = batch["kind"].combine_chunks()
        mask = pc.equal(kind, KIND_GLYPHS)
        n_glyph = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        if n_glyph == 0:
            return batch.drop_columns(["payload"])
        mask_np = mask.to_numpy(zero_copy_only=False)
        glyph_idx = np.flatnonzero(mask_np)
        pay = batch["payload"].combine_chunks().filter(mask)
        decoded = self.decode_binary_array(pay)
        # scatter decoded back: concat(non-glyph text, decoded) then take in
        # original row order — pure Arrow kernels, no Python per row.
        other_idx = np.flatnonzero(~mask_np)
        text = batch["text"].combine_chunks()
        merged_text = pa.concat_arrays(
            [text.filter(pc.invert(mask)).cast(pa.large_string()), decoded]
        )
        order = np.empty(batch.num_rows, dtype=np.int64)
        order[other_idx] = np.arange(len(other_idx))
        order[glyph_idx] = len(other_idx) + np.arange(len(glyph_idx))
        new_text = pc.take(merged_text, pa.array(order)).cast(pa.string())
        new_kind = pc.if_else(mask, pa.scalar(KIND_TEXT), kind)
        out = batch.drop_columns(["payload", "text", "kind"])
        out = out.append_column("kind", new_kind)
        out = out.append_column("text", new_text)
        return out
