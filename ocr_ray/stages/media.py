"""Multimodal (image/audio/video) span processing — real plumbing, stubbed
codecs.

Media payloads are opaque ``large_binary`` columns with typed metadata
(``media_ref``, ``media_kind``, ``n_bytes``). The decode step needs image/
audio libraries that are NOT in this environment, so ``MediaDecoder``
raises ``NotImplementedError`` for real decoding and provides a
deterministic fake behind ``fake_decode=True`` — the Ray-side plumbing
(schema, actor signature, small batch sizes for wide binary rows, output
layout) is real and tested.

The synthetic payload is pure integer arithmetic on the media_ref's
numeric suffix (``byte[i] = (37*m + 11 + 7*i) mod 256``), so the fake
decode's per-lane byte moments are SQL-expressible and the whole
media path is oracle-checked end to end (see ``media_features`` in
``pipelines/queries.py``). Everything is vectorized: payload synthesis is
one broadcasted numpy expression per batch, and feature extraction reads
the Arrow binary buffers directly (no per-row Python).

Scale notes: binary rows are wide — callers must use a small
``batch_size`` (512 default here) so batch x concurrency fits worker
heaps; blocks of oversized rows rely on Ray Data's dynamic block
splitting.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_FEATURE_DIM = 8
PAYLOAD_BYTES = 256


def _ref_numbers(refs) -> np.ndarray:
    """media_ref 'm-<num>' -> int64 numeric suffix (vectorized slice+cast)."""
    arr = refs.combine_chunks() if isinstance(refs, pa.ChunkedArray) else refs
    nums = pc.cast(pc.utf8_slice_codeunits(arr, 2, 1 << 30), pa.int64())
    return nums.to_numpy(zero_copy_only=False).astype(np.int64)


def payload_matrix(ms: np.ndarray, *, n_bytes: int = PAYLOAD_BYTES) -> np.ndarray:
    """(n, n_bytes) uint8 payload bytes: (37*m + 11 + 7*i) mod 256."""
    seeds = (ms * 37 + 11) % 256
    idx = np.arange(n_bytes, dtype=np.int64)
    return ((seeds[:, None] + idx[None, :] * 7) % 256).astype(np.uint8)


def synth_media_payload(media_ref: str, *, n_bytes: int = PAYLOAD_BYTES) -> bytes:
    """Deterministic opaque payload for one media_ref (scalar fixture
    helper; the batch path is ``attach_payloads``)."""
    m = int(media_ref[2:])
    return payload_matrix(np.array([m], dtype=np.int64), n_bytes=n_bytes)[0].tobytes()


def attach_payloads(batch: pa.Table, *, n_bytes: int = PAYLOAD_BYTES) -> pa.Table:
    """Fixture stage: attach synthetic binary payloads + metadata to media
    rows — one vectorized numpy expression, zero-copy into a
    ``large_binary`` array (flat buffer + arithmetic offsets)."""
    n = batch.num_rows
    mat = payload_matrix(_ref_numbers(batch["media_ref"]), n_bytes=n_bytes)
    offsets = (np.arange(n + 1, dtype=np.int64) * n_bytes)
    payloads = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(mat.tobytes())],
    )
    batch = batch.append_column("payload", payloads)
    batch = batch.append_column(
        "media_kind", pa.array(np.full(n, "image"), type=pa.string())
    )
    return batch.append_column(
        "n_bytes", pa.array(np.full(n, n_bytes, dtype=np.int64))
    )


class MediaDecoder:
    """Actor-pool stage: decode media payloads and extract features.

    ``__init__`` is where a real run would load the codec / model once per
    actor; ``__call__`` handles one (small) batch of binary rows and emits
    a fixed-dim feature vector per media item. The fake decode computes
    per-lane byte means straight off the Arrow binary buffers — one
    ``frombuffer`` + ``bincount`` for the whole batch, no per-row Python
    (rows of ANY length; each row's tail beyond a multiple of
    MEDIA_FEATURE_DIM is ignored, matching the lane-reshape semantics).
    """

    def __init__(self, *, fake_decode: bool = True):
        if not fake_decode:
            raise NotImplementedError(
                "general image/audio decoding requires libs not present in "
                "this environment (PIL/ffmpeg); run with fake_decode=True. "
                "Real pure-numpy codecs exist for PPM/WAV/Y4M (this module), "
                "baseline JPEG (stages/jpeg.py), PNG (stages/png.py), GIF87a "
                "(stages/gif.py), IMA-ADPCM (stages/adpcm.py) and FLAC "
                "(stages/flac.py); MP3/H.264 stay stubbed."
            )
        self.fake_decode = fake_decode

    def _feature_matrix(self, payload_col) -> np.ndarray:
        arr = (
            payload_col.combine_chunks()
            if isinstance(payload_col, pa.ChunkedArray)
            else payload_col
        )
        n = len(arr)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
        offs = offs - offs[0]
        lens = np.diff(offs)
        d = MEDIA_FEATURE_DIM
        pos = np.arange(len(data), dtype=np.int64) - np.repeat(offs[:-1], lens)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = pos < (lens[row] - lens[row] % d)
        lane_of = row[keep] * d + pos[keep] % d
        sums = np.bincount(lane_of, weights=data[keep], minlength=n * d).reshape(n, d)
        rows_per = (lens // d).astype(np.float64)
        # exact-int sums / (rows * 255.0): ONE double division, matching the
        # SQL oracle's CAST(SUM(..) AS DOUBLE) / (rows * 255.0) bit for bit.
        return sums / np.maximum(rows_per[:, None] * 255.0, 1.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = self._feature_matrix(batch["payload"])
        # left-to-right accumulation (both engines evaluate + left-assoc)
        norm_sq = feats[:, 0] * feats[:, 0]
        for j in range(1, MEDIA_FEATURE_DIM):
            norm_sq = norm_sq + feats[:, j] * feats[:, j]
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "media_kind": batch["media_kind"],
                "n_bytes": batch["n_bytes"],
                "feature": pa.array(
                    list(feats.astype(np.float32)), type=pa.list_(pa.float32())
                ),  # explicit type: an empty batch would otherwise emit null-typed
                "feature_norm": pa.array(np.sqrt(norm_sq)),
            }
        )
        for j in range(MEDIA_FEATURE_DIM):
            out = out.append_column(f"f{j}", pa.array(feats[:, j]))
        return out


def _binary_parts(payload_col):
    """(data_u8, offsets_rebased, lens) views over a binary column's
    buffers — the zero-copy accessor every media op shares."""
    arr = (
        payload_col.combine_chunks()
        if isinstance(payload_col, pa.ChunkedArray)
        else payload_col
    )
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
    offs = offs - offs[0]
    return data, offs, np.diff(offs)


def media_resize(batch: pa.Table, *, factor: int = 2) -> pa.Table:
    """'Resize' stage (stubbed codec, real plumbing): keep every
    ``factor``-th lane-row of each payload's (rows x MEDIA_FEATURE_DIM)
    byte matrix — the downsample shape a real image resize actor would
    have (decode -> subsample -> re-encode), all buffer-level vectorized.
    Output payloads are again ``large_binary`` with updated ``n_bytes``.
    """
    d = MEDIA_FEATURE_DIM
    data, offs, lens = _binary_parts(batch["payload"])
    n = len(lens)
    pos = np.arange(len(data), dtype=np.int64) - np.repeat(offs[:-1], lens)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    mat_rows = pos // d
    keep = (pos < (lens[row] - lens[row] % d)) & (mat_rows % factor == 0)
    out_bytes = data[keep]
    out_lens = np.bincount(row[keep], minlength=n).astype(np.int64)
    out_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    payload = pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(out_bytes.tobytes())],
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "media_ref": batch["media_ref"],
            "media_kind": batch["media_kind"],
            "n_bytes": pa.array(out_lens),
            "payload": payload,
        }
    )


FRAME_BYTES = 64


def media_frame_sample(batch: pa.Table, *, every: int = 4) -> pa.Table:
    """Frame sampling (the video-path stage shape): treat each payload as
    consecutive ``FRAME_BYTES`` frames and emit every ``every``-th frame
    as its own row (flat_map expansion) with a u64 frame checksum —
    buffer-level vectorized gather, no per-row Python. A real video
    pipeline swaps the frame splitter for a demuxer in an actor pool;
    the Ray-side shape (expansion, schema, checksums) is identical."""
    data, offs, lens = _binary_parts(batch["payload"])
    n = len(lens)
    n_frames = lens // FRAME_BYTES
    n_out = (n_frames + every - 1) // every
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_out)
    first = np.concatenate([[0], np.cumsum(n_out)])[:-1]
    fidx = (np.arange(int(n_out.sum()), dtype=np.int64) - np.repeat(first, n_out)) * every
    byte_start = offs[:-1][doc_of] + fidx * FRAME_BYTES
    total = int(n_out.sum()) * FRAME_BYTES
    idx = (
        np.repeat(byte_start, FRAME_BYTES)
        + np.tile(np.arange(FRAME_BYTES, dtype=np.int64), int(n_out.sum()))
    )
    frames = data[idx]  # safe for total==0: idx is empty
    out_offs = np.arange(int(n_out.sum()) + 1, dtype=np.int64) * FRAME_BYTES
    payload = pa.Array.from_buffers(
        pa.large_binary(),
        int(n_out.sum()),
        [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(frames.tobytes())],
    )
    fm = frames.reshape(-1, FRAME_BYTES).astype(np.uint64)
    with np.errstate(over="ignore"):
        csum = np.zeros(len(fm), dtype=np.uint64)
        mult = np.uint64(0x9E3779B97F4A7C15)
        for j in range(FRAME_BYTES):
            csum = csum * mult + fm[:, j]
    ids = pc.take(batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"], pa.array(doc_of))
    refs = pc.take(batch["media_ref"].combine_chunks() if isinstance(batch["media_ref"], pa.ChunkedArray) else batch["media_ref"], pa.array(doc_of))
    return pa.table(
        {
            "doc_id": ids,
            "media_ref": refs,
            "frame_id": pa.array(fidx),
            "frame": payload,
            "frame_checksum": pa.array(csum, type=pa.uint64()),
        }
    )


# ---------------------------------------------------------------------------
# REAL codec path: PPM (P6) — a genuine image format decodable with pure
# numpy, so the "real decode" branch of the media pipeline is exercised
# end-to-end (and oracle-checked) without PIL/ffmpeg. Baseline JPEG is
# real too (stages/jpeg.py); MP3/H.264 stay stubbed behind
# NotImplementedError.
# ---------------------------------------------------------------------------

PPM_W, PPM_H = 16, 8


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8, (img.shape, img.dtype)
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. A real parser: tokenizes the
    header (whitespace + '#' comments per the netpbm spec), validates
    magic/maxval, and views the raster zero-copy."""
    if buf[:2] != b"P6":
        raise ValueError(f"not a P6 PPM (magic {buf[:2]!r})")
    # header: magic, width, height, maxval — tokens separated by
    # whitespace; '#' starts a comment to end-of-line
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        tokens.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported (maxval {maxval})")
    raster = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def ppm_image(m: int) -> np.ndarray:
    """Deterministic (PPM_H, PPM_W, 3) test image for media_ref suffix m:
    pixel = (37*m + 11 + 13*y + 7*x + 29*c) mod 256 — closed-form, so the
    decoded channel means are SQL-expressible."""
    y = np.arange(PPM_H, dtype=np.int64)[:, None, None]
    x = np.arange(PPM_W, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((37 * m + 11 + 13 * y + 7 * x + 29 * c) % 256).astype(np.uint8)


def attach_ppm_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real P6-encoded payloads to media rows."""
    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_ppm(ppm_image(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind", pa.array(np.full(batch.num_rows, "image/ppm"), type=pa.string())
    )


class PpmDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL PPM decode + per-channel statistics.

    Decoding is inherently per-item (each payload is its own file), which
    is exactly the real-codec shape: small batches of wide binary rows,
    one decode call per item inside the batch, vectorized stats on the
    decoded array. ``__init__`` is where a heavier codec/model would load
    once per actor."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        w_l, h_l, means = [], [], []
        for buf in payloads:
            img = decode_ppm(buf)
            h_l.append(img.shape[0])
            w_l.append(img.shape[1])
            # SUM/(h*w) as DOUBLE — the oracle's expression verbatim
            means.append(
                img.reshape(-1, 3).sum(axis=0, dtype=np.int64).astype(np.float64)
                / float(img.shape[0] * img.shape[1])
            )
        mm = np.stack(means) if means else np.empty((0, 3))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "width": pa.array(np.asarray(w_l, dtype=np.int64)),
                "height": pa.array(np.asarray(h_l, dtype=np.int64)),
                "mean_r": pa.array(mm[:, 0] if len(mm) else np.empty(0)),
                "mean_g": pa.array(mm[:, 1] if len(mm) else np.empty(0)),
                "mean_b": pa.array(mm[:, 2] if len(mm) else np.empty(0)),
            }
        )


# ---------------------------------------------------------------------------
# REAL codec path #2: WAV (RIFF/PCM16) — the audio leg, decodable with pure
# numpy. Same contract as the PPM path: a genuine parser (chunked RIFF
# walk, format validation), closed-form synthetic signal, oracle-checked
# decoded statistics.
# ---------------------------------------------------------------------------

WAV_SR = 8000
WAV_N = 64  # samples per synthetic clip


def encode_wav(samples: np.ndarray, *, sample_rate: int = WAV_SR) -> bytes:
    """(n,) int16 mono PCM -> RIFF/WAVE bytes (fmt + data chunks)."""
    assert samples.dtype == np.int16, samples.dtype
    data = samples.tobytes()
    fmt = (
        (1).to_bytes(2, "little")            # PCM
        + (1).to_bytes(2, "little")          # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")          # block align
        + (16).to_bytes(2, "little")         # bits/sample
    )
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE (PCM16 mono) -> (samples int16, sample_rate). A real
    chunk-walking parser: validates RIFF/WAVE magic, iterates chunks
    (skipping unknown ones, honoring the odd-length pad byte), and reads
    fmt before data per the spec."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError(f"not RIFF/WAVE ({buf[:4]!r}/{buf[8:12]!r})")
    i = 12
    sample_rate = None
    samples = None
    while i + 8 <= len(buf):
        cid = buf[i : i + 4]
        sz = int.from_bytes(buf[i + 4 : i + 8], "little")
        body = buf[i + 8 : i + 8 + sz]
        if len(body) != sz:
            raise ValueError(
                f"WAV chunk {cid!r} declares {sz} bytes but only "
                f"{len(body)} remain (truncated payload)"
            )
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(f"only PCM16 mono supported (fmt={audio_fmt}, ch={channels}, bits={bits})")
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            samples = np.frombuffer(body, dtype=np.int16)
        i += 8 + sz + (sz & 1)  # odd chunk sizes are padded
    if samples is None:
        raise ValueError("no data chunk")
    return samples, sample_rate


def wav_signal(m: int) -> np.ndarray:
    """Deterministic int16 test clip for media_ref suffix m:
    sample[i] = ((m*53 + 17*i) mod 4001) - 2000 — closed-form integers,
    so decoded sum / sum-of-squares are SQL-expressible exactly."""
    i = np.arange(WAV_N, dtype=np.int64)
    return (((m * 53 + 17 * i) % 4001) - 2000).astype(np.int16)


def attach_wav_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real RIFF/PCM16 payloads to media rows."""
    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_wav(wav_signal(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind", pa.array(np.full(batch.num_rows, "audio/wav"), type=pa.string())
    )


class WavDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL WAV decode + integer-exact clip statistics
    (n_samples, sample_rate, sum and sum-of-squares of samples — held in
    int64, so the oracle comparison is exact; RMS/dBFS are one float op
    away for consumers)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_l, sr_l, s_l, ss_l = [], [], [], []
        for buf in batch["payload"].to_pylist():
            x, sr = decode_wav(buf)
            xi = x.astype(np.int64)
            n_l.append(len(x))
            sr_l.append(sr)
            s_l.append(int(xi.sum()))
            ss_l.append(int((xi * xi).sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "n_samples": pa.array(np.asarray(n_l, dtype=np.int64)),
                "sample_rate": pa.array(np.asarray(sr_l, dtype=np.int64)),
                "sum_amp": pa.array(np.asarray(s_l, dtype=np.int64)),
                "sum_sq": pa.array(np.asarray(ss_l, dtype=np.int64)),
            }
        )


class WalshDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL WAV decode + Walsh–Hadamard sequency
    correlates over the decoded PCM — frequency-domain features through
    an integer-exact transform. The square-wave (±1) basis plays the
    role of DFT sinusoids: correlate k alternates sign every 2^k
    samples, so low k picks up high "sequency" (frequency-like) content.
    Because every term is integer arithmetic, the whole spectral feature
    is SQL-expressible and oracle-checked BIT-EXACT — which a float FFT
    could never be (summation-order ulp drift).

    The ±1 basis is built once per actor in ``__init__``; per batch the
    decoded fixed-length clips stack into one (n, 64) int64 matrix and
    all correlates are ONE matmul."""

    _BITS = (0, 1, 2)

    def __init__(self):
        i = np.arange(WAV_N, dtype=np.int64)
        self._basis = np.stack(
            [1 - 2 * ((i >> k) & 1) for k in self._BITS], axis=1
        )  # (WAV_N, len(_BITS)), entries ±1

    def __call__(self, batch: pa.Table) -> pa.Table:
        clips = np.empty((batch.num_rows, WAV_N), dtype=np.int64)
        for j, buf in enumerate(batch["payload"].to_pylist()):
            x, _sr = decode_wav(buf)  # the RIFF walk is inherently per-clip
            if len(x) != WAV_N:
                raise ValueError(
                    f"Walsh correlates need exactly {WAV_N}-sample clips, "
                    f"got {len(x)} (a short clip would silently broadcast)"
                )
            clips[j] = x.astype(np.int64)
        e = clips @ self._basis
        cols = {"doc_id": batch["doc_id"], "media_ref": batch["media_ref"]}
        for col, k in enumerate(self._BITS):
            cols[f"walsh_b{k}"] = pa.array(e[:, col])
        return pa.table(cols)


# ---------------------------------------------------------------------------
# REAL codec path #3: Y4M (YUV4MPEG2) — the video leg. An actual video
# container (text header + uncompressed 4:2:0 frames) parseable with pure
# numpy; completes the image/audio/video real-decode trio.
# ---------------------------------------------------------------------------

Y4M_W, Y4M_H, Y4M_FRAMES = 8, 4, 5


def encode_y4m(frames: np.ndarray, *, fps: str = "25:1") -> bytes:
    """(f, h, w) uint8 LUMA frames -> YUV4MPEG2 bytes (C420 with flat
    chroma planes at 128)."""
    f, h, w = frames.shape
    assert frames.dtype == np.uint8
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [hdr]
    for k in range(f):
        out.append(b"FRAME\n")
        out.append(frames[k].tobytes())
        out.append(chroma)  # U
        out.append(chroma)  # V
    return b"".join(out)


def decode_y4m(buf: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 (C420) -> ((f, h, w) uint8 luma frames, (fps_num, fps_den)).
    A real parser: stream-header tag walk (W/H/F/C with validation),
    per-FRAME marker checks, plane-size arithmetic."""
    nl = buf.index(b"\n")
    head = buf[:nl].split(b" ")
    if head[0] != b"YUV4MPEG2":
        raise ValueError(f"not YUV4MPEG2 ({head[0]!r})")
    w = h = None
    fps = (25, 1)
    for tag in head[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"F":
            a, b = tag[1:].split(b":")
            fps = (int(a), int(b))
        elif tag[:1] == b"C" and tag not in (b"C420", b"C420jpeg", b"C420mpeg2"):
            raise ValueError(f"only C420 supported ({tag!r})")
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    i = nl + 1
    frames = []
    while i < len(buf):
        j = buf.index(b"\n", i)
        if buf[i : i + 5] != b"FRAME":
            raise ValueError(f"bad frame marker at {i}")
        i = j + 1
        luma = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=i)
        frames.append(luma.reshape(h, w))
        i += frame_bytes
    if not frames:  # header-only stream is legal Y4M
        return np.empty((0, h, w), dtype=np.uint8), fps
    return np.stack(frames), fps


def y4m_frames(m: int) -> np.ndarray:
    """Deterministic (F, H, W) uint8 luma frames for media_ref suffix m:
    pixel = (m*41 + 19*f + 13*y + 7*x) mod 256 — closed-form for the
    oracle."""
    f = np.arange(Y4M_FRAMES, dtype=np.int64)[:, None, None]
    y = np.arange(Y4M_H, dtype=np.int64)[None, :, None]
    x = np.arange(Y4M_W, dtype=np.int64)[None, None, :]
    return ((41 * m + 19 * f + 13 * y + 7 * x) % 256).astype(np.uint8)


def attach_y4m_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real YUV4MPEG2 payloads to media rows."""
    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_y4m(y4m_frames(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind", pa.array(np.full(batch.num_rows, "video/y4m"), type=pa.string())
    )


class Y4mDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL video decode + per-clip frame statistics
    (frame count, dims, fps, integer-exact total and per-FIRST/LAST-frame
    luma sums — a frame-stride or plane-offset bug fails the oracle)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf, ww, hh, fn, sum_all, sum_first, sum_last = [], [], [], [], [], [], []
        for buf in batch["payload"].to_pylist():
            frames, (num, _den) = decode_y4m(buf)
            fi = frames.astype(np.int64)
            nf.append(frames.shape[0])
            hh.append(frames.shape[1])
            ww.append(frames.shape[2])
            fn.append(num)
            sum_all.append(int(fi.sum()))
            sum_first.append(int(fi[0].sum()))
            sum_last.append(int(fi[-1].sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "n_frames": pa.array(np.asarray(nf, dtype=np.int64)),
                "width": pa.array(np.asarray(ww, dtype=np.int64)),
                "height": pa.array(np.asarray(hh, dtype=np.int64)),
                "fps_num": pa.array(np.asarray(fn, dtype=np.int64)),
                "luma_sum": pa.array(np.asarray(sum_all, dtype=np.int64)),
                "luma_sum_first": pa.array(np.asarray(sum_first, dtype=np.int64)),
                "luma_sum_last": pa.array(np.asarray(sum_last, dtype=np.int64)),
            }
        )


class PpmDHashDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL PPM decode -> perceptual difference hash.

    dHash on the native 16x8 raster: integer grayscale ``(r+g+b)//3``,
    one bit per horizontally adjacent pair (``gray[y][x+1] > gray[y][x]``,
    bit index ``k = y*15 + x``), packed into two non-negative int64s
    (``lo`` = bits 0..59, ``hi`` = bits 60..119). Output one row per
    media span: (doc_id, media_ref, m, dhash_lo, dhash_hi) — the
    image-level fingerprint multimodal dedup groups on."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        lo = np.zeros(len(payloads), dtype=np.int64)
        hi = np.zeros(len(payloads), dtype=np.int64)
        for i, buf in enumerate(payloads):
            img = decode_ppm(buf).astype(np.int64)
            gray = img.sum(axis=2) // 3
            bits = (gray[:, 1:] > gray[:, :-1]).ravel()  # y-major, k = y*15+x
            k = np.flatnonzero(bits)
            lo[i] = int(((np.int64(1) << k[k < 60]).sum()))
            hi[i] = int(((np.int64(1) << (k[k >= 60] - 60)).sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "m": pa.array(_ref_numbers(batch["media_ref"])),
                "dhash_lo": pa.array(lo),
                "dhash_hi": pa.array(hi),
            }
        )


class WavFingerprintDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL WAV decode -> acoustic fingerprint.

    Chromaprint-style energy-contour hash on the decoded PCM: 16 frames
    of 4 samples, integer frame energy (sum of squares), one bit per
    adjacent frame pair (``energy[f+1] > energy[f]``), packed into an
    int64 (15 bits). Output one row per media span: (doc_id, media_ref,
    m, afp) — the clip-level fingerprint audio dedup groups on."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fps = np.zeros(len(payloads), dtype=np.int64)
        for i, buf in enumerate(payloads):
            samples, _sr = decode_wav(buf)
            s = samples.astype(np.int64)
            energy = (s * s).reshape(-1, 4).sum(axis=1)
            bits = energy[1:] > energy[:-1]
            k = np.flatnonzero(bits)
            fps[i] = int((np.int64(1) << k).sum())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "m": pa.array(_ref_numbers(batch["media_ref"])),
                "afp": pa.array(fps),
            }
        )
