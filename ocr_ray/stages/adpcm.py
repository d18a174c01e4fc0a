"""REAL compressed-audio codec: IMA/DVI ADPCM (WAV format tag 0x11).

The audio sibling of the PNG/JPEG compressed-image legs: a genuine 4:1
adaptive-differential codec with SEQUENTIAL per-sample state (predictor +
step index), implemented pure-numpy. Encoder and decoder are complete —
RIFF/WAVE container with wFormatTag=0x11 (fmt with cbSize/samplesPerBlock
extension, mandatory ``fact`` chunk for compressed WAV), IMA block layout
(int16 predictor seed + step index header, low-nibble-first 4-bit codes),
and the standard IMA quantize/reconstruct step tables.

Why this codec matters for the correctness story: in IMA ADPCM the
decoder's output sample IS the updated predictor, and every state
transition is integer arithmetic (shifts, adds, clamps, table lookups) —
so the WHOLE encode+decode chain over the closed-form fixture signal is
expressible as a recursive CTE in DuckDB. ``media_adpcm_features`` is
therefore oracle-checked BIT-EXACT end to end despite the codec being
lossy and stateful: a nibble-packing, table, clamp, or container bug
fails the hash. (Contrast: the JPEG leg needed a DC-only fixture to be
SQL-expressible; here the full adaptive path is in the oracle.)

Scale shape: container parsing is per-item, but the nibble decode is
VECTORIZED ACROSS STREAMS — a batch of equal-length clips decodes in
lockstep (state arrays of shape (n_streams,), one pass over sample index)
— the right orientation when each clip is short and batches are wide.
Ragged batches fall back to per-item decode through the same kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# IMA/DVI ADPCM quantizer tables (public spec constants).
STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)

ADPCM_SR = 8000
ADPCM_N = 64  # samples per synthetic clip (one IMA block)


# ---------------------------------------------------------------------------
# Core codec (block level)
# ---------------------------------------------------------------------------


def _encode_ima_block(samples: np.ndarray, idx0: int = 0) -> tuple[int, int, np.ndarray, int]:
    """One IMA block: (samples, entry step index) -> (predictor_seed,
    idx0, codes, exit step index). The first sample is stored verbatim in
    the block header (with the CURRENT step index — how real encoders
    chain blocks); each later sample quantizes ``sample - predictor``
    against the adaptive step and updates state exactly as the decoder
    will, keeping both in lockstep."""
    assert samples.dtype == np.int16 and samples.ndim == 1 and len(samples) >= 1
    pred = int(samples[0])
    idx = int(idx0)
    codes = np.zeros(len(samples) - 1, dtype=np.uint8)
    for i in range(1, len(samples)):
        step = int(STEP_TABLE[idx])
        diff = int(samples[i]) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        vpdiff = (step >> 3)
        if code & 4:
            vpdiff += step
        if code & 2:
            vpdiff += step >> 1
        if code & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if code & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(INDEX_TABLE[code & 7])))
        codes[i - 1] = code
    return int(samples[0]), int(idx0), codes, idx


def encode_ima_codes(samples: np.ndarray) -> tuple[int, np.ndarray]:
    """Single-block convenience wrapper: -> (predictor_seed, codes)."""
    pred0, _idx0, codes, _idx = _encode_ima_block(samples, 0)
    return pred0, codes


def decode_ima_codes(pred0: int, codes: np.ndarray, idx0: int = 0) -> np.ndarray:
    """Scalar reference decoder: (seed, codes) -> (len(codes)+1,) int16."""
    out = np.zeros(len(codes) + 1, dtype=np.int16)
    pred, idx = int(pred0), int(idx0)
    out[0] = pred
    for i, code in enumerate(np.asarray(codes, dtype=np.int64)):
        step = int(STEP_TABLE[idx])
        vpdiff = step >> 3
        if code & 4:
            vpdiff += step
        if code & 2:
            vpdiff += step >> 1
        if code & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if code & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(INDEX_TABLE[code & 7])))
        out[i + 1] = pred
    return out


def decode_ima_lockstep(
    pred0: np.ndarray, codes: np.ndarray, idx0: np.ndarray | None = None
) -> np.ndarray:
    """Vectorized-across-streams decoder: pred0 (n,), codes (n, k) ->
    samples (n, k+1) int16. One pass over the sample axis with (n,)-shaped
    state vectors — the hot-batch orientation for short clips."""
    n, k = codes.shape
    pred = np.asarray(pred0, dtype=np.int64).copy()
    idx = (
        np.zeros(n, dtype=np.int64)
        if idx0 is None
        else np.asarray(idx0, dtype=np.int64).copy()
    )
    c64 = np.asarray(codes, dtype=np.int64)
    out = np.zeros((n, k + 1), dtype=np.int64)
    out[:, 0] = pred
    for i in range(k):
        c = c64[:, i]
        step = STEP_TABLE[idx]
        vpdiff = (
            (step >> 3)
            + np.where(c & 4, step, 0)
            + np.where(c & 2, step >> 1, 0)
            + np.where(c & 1, step >> 2, 0)
        )
        pred = np.clip(np.where(c & 8, pred - vpdiff, pred + vpdiff), -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[c & 7], 0, 88)
        out[:, i + 1] = pred
    return out.astype(np.int16)


# ---------------------------------------------------------------------------
# RIFF/WAVE container (format tag 0x11)
# ---------------------------------------------------------------------------


def _pack_block(pred0: int, idx0: int, codes: np.ndarray, n_nib_bytes: int) -> bytes:
    """IMA block bytes: int16 predictor, step index, reserved, low-nibble-
    first 4-bit codes padded to ``n_nib_bytes``."""
    padded = np.zeros(n_nib_bytes * 2, dtype=np.uint8)
    padded[: len(codes)] = codes
    nib = (padded[0::2] | (padded[1::2] << 4)).tobytes()
    return (
        int(pred0).to_bytes(2, "little", signed=True)
        + bytes([int(idx0), 0])
        + nib
    )


def encode_adpcm_wav(
    samples: np.ndarray,
    *,
    sample_rate: int = ADPCM_SR,
    samples_per_block: int | None = None,
) -> bytes:
    """(n,) int16 mono -> RIFF/WAVE with IMA-ADPCM data.

    Default: one block holding the whole clip (the fixture shape). With
    ``samples_per_block``, a REAL multi-block file: every block stores its
    first sample verbatim plus the carried step index in the 4-byte
    header, codes for the remaining samples, and full-block nibble
    padding; the last block may be short."""
    n = len(samples)
    spb = n if samples_per_block is None else int(samples_per_block)
    if spb < 1:
        raise ValueError(f"samples_per_block must be >= 1, got {spb}")
    n_nib_bytes = (spb - 1 + 1) // 2
    block_align = 4 + n_nib_bytes
    blocks = []
    idx = 0
    for start in range(0, n, spb):
        chunk = samples[start : start + spb]
        pred0, idx0, codes, idx = _encode_ima_block(chunk, idx)
        # all blocks, including a short last one, are padded to block_align
        blocks.append(_pack_block(pred0, idx0, codes, n_nib_bytes))
    block = b"".join(blocks)
    fmt = (
        (0x11).to_bytes(2, "little")
        + (1).to_bytes(2, "little")              # mono
        + sample_rate.to_bytes(4, "little")
        + ((sample_rate * block_align + spb - 1) // spb).to_bytes(4, "little")  # byte rate
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")              # bits per (coded) sample
        + (2).to_bytes(2, "little")              # cbSize
        + spb.to_bytes(2, "little")              # samplesPerBlock
    )
    fact = n.to_bytes(4, "little")
    body = b"WAVE"
    body += b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"fact" + len(fact).to_bytes(4, "little") + fact
    # RIFF word alignment: an odd-sized chunk is followed by a zero pad
    # byte (excluded from the chunk size, included in the RIFF size) —
    # the walker in parse_adpcm_blocks already skips it (sz & 1).
    body += b"data" + len(block).to_bytes(4, "little") + block
    if len(block) & 1:
        body += b"\x00"
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def parse_adpcm_blocks(buf: bytes) -> tuple[list[tuple[int, int, np.ndarray]], int]:
    """RIFF/WAVE (IMA-ADPCM mono) -> ([(pred0, idx0, codes)] per block,
    rate).

    A real chunk walker: validates magic, requires fmt tag 0x11 / mono /
    4-bit, splits the data chunk by the fmt chunk's ``blockAlign``, caps
    each block's samples at the extension's ``samplesPerBlock``, and
    honors the fact chunk's TOTAL sample count (trimming nibble padding
    in the final block). Pads odd chunks per RIFF."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(f"not RIFF/WAVE ({buf[:4]!r}/{buf[8:12]!r})")
    i = 12
    sample_rate = None
    n_samples = None
    block_align = None
    spb = None
    data = None
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        sz = int.from_bytes(buf[i + 4 : i + 8], "little")
        body = buf[i + 8 : i + 8 + sz]
        if len(body) != sz:
            raise ValueError(f"WAV chunk {cid!r} truncated ({len(body)}/{sz} bytes)")
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if (tag, channels, bits) != (0x11, 1, 4):
                raise ValueError(
                    f"only IMA-ADPCM mono 4-bit supported (tag={tag:#x}, ch={channels}, bits={bits})"
                )
            if len(body) >= 20:  # cbSize + samplesPerBlock extension
                spb = int.from_bytes(body[18:20], "little")
        elif cid == b"fact":
            n_samples = int.from_bytes(body[0:4], "little")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            data = body
        i += 8 + sz + (sz & 1)
    if data is None or n_samples is None:
        raise ValueError("missing data or fact chunk")
    if not block_align or block_align < 4:
        raise ValueError(f"bad blockAlign {block_align!r}")
    if spb is None or spb < 1:
        raise ValueError("missing samplesPerBlock extension (required for tag 0x11)")
    blocks: list[tuple[int, int, np.ndarray]] = []
    remaining = n_samples
    for off in range(0, len(data), block_align):
        if remaining <= 0:
            break
        blk = data[off : off + block_align]
        if len(blk) < 4:
            raise ValueError("IMA block shorter than its 4-byte header")
        pred0 = int.from_bytes(blk[0:2], "little", signed=True)
        idx0 = blk[2]
        if idx0 > 88:
            raise ValueError(f"step index {idx0} out of range")
        packed = np.frombuffer(blk, dtype=np.uint8, offset=4)
        codes = np.zeros(len(packed) * 2, dtype=np.uint8)
        codes[0::2] = packed & 0x0F
        codes[1::2] = packed >> 4
        n_here = min(spb, remaining)
        blocks.append((pred0, idx0, codes[: n_here - 1]))
        remaining -= n_here
    if remaining > 0:
        raise ValueError(
            f"data chunk ends {remaining} samples short of the fact count"
        )
    return blocks, sample_rate


def parse_adpcm_wav(buf: bytes) -> tuple[int, int, np.ndarray, int]:
    """Single-block convenience parse: -> (pred0, idx0, codes, rate).

    The fixture shape (and the lockstep batch decoder's input) is one
    block per clip; a multi-block file raises loudly — use
    ``decode_adpcm_wav``/``parse_adpcm_blocks`` for those."""
    blocks, rate = parse_adpcm_blocks(buf)
    if len(blocks) != 1:
        raise ValueError(
            f"multi-block IMA file ({len(blocks)} blocks); use "
            "decode_adpcm_wav/parse_adpcm_blocks"
        )
    pred0, idx0, codes = blocks[0]
    return pred0, idx0, codes, rate


def decode_adpcm_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/IMA-ADPCM bytes -> (int16 samples, sample_rate); multi-block
    files decode block by block (each header re-seeds the predictor and
    carries the step index) and concatenate."""
    blocks, rate = parse_adpcm_blocks(buf)
    parts = [decode_ima_codes(p0, codes, i0) for p0, i0, codes in blocks]
    return np.concatenate(parts), rate


# ---------------------------------------------------------------------------
# Fixture + actor stage (same contract as PPM/WAV/Y4M/JPEG/PNG)
# ---------------------------------------------------------------------------


def adpcm_signal(m: int) -> np.ndarray:
    """Deterministic int16 test clip for media_ref suffix m:
    sample[i] = ((m*59 + 23*i) mod 4001) - 2000 — closed-form, so the
    recursive-CTE oracle can regenerate it sample by sample."""
    i = np.arange(ADPCM_N, dtype=np.int64)
    return (((m * 59 + 23 * i) % 4001) - 2000).astype(np.int16)


def attach_adpcm_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real IMA-ADPCM WAV payloads to media rows."""
    from ocr_ray.stages.media import _ref_numbers

    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_adpcm_wav(adpcm_signal(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind",
        pa.array(np.full(batch.num_rows, "audio/adpcm"), type=pa.string()),
    )


class AdpcmDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL IMA-ADPCM decode + integer-exact clip stats
    (n_samples, sum and sum-of-squares of the DECODED samples). Equal-
    length clips in a batch decode in lockstep (one vectorized pass over
    the sample axis); ragged batches fall back to per-item decode.

    ``verify`` (default on — the run-time exactness-gate pattern from the
    BPE/IVF queries) cross-checks the lockstep kernel against the scalar
    reference decoder on the first clip of every batch, so even a
    rows-only driver check carries kernel-equivalence weight."""

    def __init__(self, *, verify: bool = True):
        self.verify = verify

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = [parse_adpcm_wav(buf) for buf in batch["payload"].to_pylist()]
        n_l = np.array([len(c) + 1 for _, _, c, _ in parsed], dtype=np.int64)
        if len(parsed) and (n_l == n_l[0]).all():
            pred0 = np.array([p for p, _, _, _ in parsed], dtype=np.int64)
            idx0 = np.array([ix for _, ix, _, _ in parsed], dtype=np.int64)
            codes = np.stack([c for _, _, c, _ in parsed])
            dec = decode_ima_lockstep(pred0, codes, idx0).astype(np.int64)
            if self.verify:
                ref = decode_ima_codes(parsed[0][0], parsed[0][2], parsed[0][1])
                if not np.array_equal(dec[0], ref.astype(np.int64)):
                    raise AssertionError(
                        "lockstep ADPCM decode diverged from scalar reference"
                    )
            sums = dec.sum(axis=1)
            sqs = (dec * dec).sum(axis=1)
        else:
            rows = [
                decode_ima_codes(p, c, ix).astype(np.int64)
                for p, ix, c, _ in parsed
            ]
            sums = np.array([r.sum() for r in rows], dtype=np.int64)
            sqs = np.array([(r * r).sum() for r in rows], dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "n_samples": pa.array(n_l),
                "sum_amp": pa.array(np.asarray(sums, dtype=np.int64)),
                "sum_sq": pa.array(np.asarray(sqs, dtype=np.int64)),
            }
        )
