"""REAL lossless-audio codec: FLAC (fixed-predictor subset).

The lossless sibling of the ADPCM leg: a genuine FLAC implementation —
``fLaC`` magic, STREAMINFO metadata block, frame headers with the 14-bit
sync code and UTF-8-coded frame numbers, CRC-8 (poly 0x07) header and
CRC-16 (poly 0x8005) frame checksums, subframes (CONSTANT / VERBATIM /
FIXED orders 0–4 with warmup samples), and Rice-coded residuals
(zigzag fold, unary quotient = q zeros then a one, k low bits) — all
pure python/numpy, bit-level, from the public format spec.

The encoder emits the FLAC *subset* every real decoder accepts: fixed
blocksize, mono 16-bit, per-frame best fixed predictor by
sum-of-absolute-residuals, partition order 0, Rice parameter from the
residual mean (with the 0b1111 verbatim-escape when Rice would expand).
The decoder verifies BOTH CRCs and every reserved bit — a flipped bit
anywhere in the stream raises, it does not decode quietly wrong.

Why this codec closes the loop the lossy legs can't: FLAC is LOSSLESS,
so the decoded clip must equal the source signal sample-for-sample —
the ``media_flac_features`` oracle is the *raw-signal* stats SQL (the
same one the uncompressed WAV leg uses), and any bug in zigzag, unary,
warmup, predictor reconstruction, bit packing, or CRC handling breaks
the value hash. No recursive-CTE reproduction of codec state needed:
losslessness IS the oracle.

Scale shape: container/bit parsing is inherently per-clip (runs inside
actor-pool tasks, never the driver); the predictor reconstruction is a
cumulative-sum cascade — order-d fixed prediction inverts as d nested
``np.cumsum`` passes over the residual vector, so the arithmetic is
vectorized per clip even though framing is sequential.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_ray.stages.media import wav_signal, _ref_numbers

# --------------------------------------------------------------------------
# CRCs (FLAC uses non-reflected CRC-8/0x07 init 0 and CRC-16/0x8005 init 0)
# --------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tab = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if c & top else (c << 1)
        tab[i] = c & mask
    return tab


_CRC8_TAB = _crc_table(0x07, 8)
_CRC16_TAB = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TAB[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# --------------------------------------------------------------------------
# bit-level IO
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        d, p = self.data, self.pos
        end = p + nbits
        if end > len(d) * 8:
            raise ValueError("flac: bitstream truncated")
        while p < end:
            byte = d[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, end - p)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            p += take
        self.pos = end
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8


# --------------------------------------------------------------------------
# fixed predictors
# --------------------------------------------------------------------------

def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)  # order-d fixed predictor == d-th difference
    return r


# --------------------------------------------------------------------------
# rice coding
# --------------------------------------------------------------------------


def _rice_encode(bw: _BitWriter, resid: np.ndarray, k: int) -> None:
    u = np.where(resid >= 0, resid << 1, (-resid << 1) - 1).astype(np.int64)
    for v in u.tolist():
        bw.write_unary(int(v) >> k)
        if k:
            bw.write(int(v) & ((1 << k) - 1), k)


def _rice_decode(br: _BitReader, n: int, k: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        q = br.read_unary()
        u = (q << k) | (br.read(k) if k else 0)
        out[i] = (u >> 1) ^ -(u & 1)  # unfold zigzag
    return out


def _best_rice_k(resid: np.ndarray) -> int:
    if len(resid) == 0:
        return 0
    mean = float(np.abs(resid).mean())
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < 14:
        k += 1
    return k


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

_BPS = 16


def _utf8_frame_number(bw: _BitWriter, n: int) -> None:
    # FLAC's UTF-8-style variable-length code, general form: k extra
    # bytes carry 6 bits each under a (k+1)-ones lead byte (up to 6
    # extras = 36 bits, the spec's sample-number ceiling)
    if n < 0x80:
        bw.write(n, 8)
        return
    for extra in range(1, 7):
        lead_bits = 6 - extra  # payload bits in the lead byte
        if n < (1 << (lead_bits + 6 * extra)):
            lead = (0xFF << (lead_bits + 1)) & 0xFF
            bw.write(lead | (n >> (6 * extra)), 8)
            for i in range(extra - 1, -1, -1):
                bw.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError(f"flac: frame number {n} exceeds the 36-bit code")


def _lpc_quantize(x: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin LPC fit + spec quantization. Returns
    (qcoefs int64[order], shift) or None when the signal is degenerate
    (zero autocorrelation / unstable recursion)."""
    n = len(x)
    if n <= order:
        return None
    xf = x.astype(np.float64)
    ac = np.array([float(np.dot(xf[: n - k], xf[k:])) for k in range(order + 1)])
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        if err == 0.0:
            return None
        k = acc / err
        new_a = a.copy()
        new_a[i] = k
        for j in range(i):
            new_a[j] = a[j] - k * a[i - 1 - j]
        a = new_a
        err *= 1.0 - k * k
        if not np.isfinite(err) or err < 0:
            return None
    cmax = float(np.abs(a).max())
    if cmax == 0.0 or not np.isfinite(cmax):
        return None
    # largest shift in [0, 15] keeping every coef inside precision bits
    lim = (1 << (precision - 1)) - 1
    shift = 15
    while shift > 0 and cmax * (1 << shift) > lim:
        shift -= 1
    q = np.clip(np.round(a * (1 << shift)), -(lim + 1), lim).astype(np.int64)
    if not q.any():
        return None
    return q, shift


def _encode_lpc_subframe(bw: _BitWriter, xi: np.ndarray, order: int, precision: int = 12) -> bool:
    """Emit an LPC subframe (type 1ooooo). Returns False if the fit is
    degenerate (caller falls back to FIXED)."""
    fit = _lpc_quantize(xi, order, precision)
    if fit is None:
        return False
    q, shift = fit
    n = len(xi)
    pred = np.empty(n - order, dtype=np.int64)
    for i in range(order, n):
        pred[i - order] = int(np.dot(q, xi[i - order : i][::-1])) >> shift
    resid = xi[order:] - pred
    k = _best_rice_k(resid)
    bw.write(0, 1)
    bw.write(0b100000 | (order - 1), 6)
    bw.write(0, 1)
    for v in xi[:order].tolist():
        bw.write(int(v), _BPS)
    bw.write(precision - 1, 4)
    bw.write(shift, 5)  # nonnegative; 5-bit field
    for c in q.tolist():
        bw.write(int(c), precision)
    bw.write(0b00, 2)
    bw.write(0, 4)
    bw.write(k, 4)
    _rice_encode(bw, resid, k)
    return True


def _encode_subframe(bw: _BitWriter, x: np.ndarray, *, lpc_order: int | None = None) -> None:
    xi = x.astype(np.int64)
    if np.all(xi == xi[0]):
        bw.write(0, 1)  # pad
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(int(xi[0]), _BPS)
        return
    if lpc_order and len(xi) > lpc_order:
        if _encode_lpc_subframe(bw, xi, lpc_order):
            return
        # degenerate fit: fall through to the FIXED path
    # pick the best fixed order by sum(|residual|)
    best_order, best_cost, best_resid = 0, None, None
    max_order = min(4, len(xi) - 1)
    for order in range(max_order + 1):
        r = _fixed_residual(xi, order)
        cost = int(np.abs(r).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost, best_resid = order, cost, r
    k = _best_rice_k(best_resid)
    rice_bits = len(best_resid) * (k + 1) + int(
        (np.abs(best_resid * 2).sum()) >> k if k else np.abs(best_resid * 2).sum()
    )
    if rice_bits > len(xi) * _BPS:
        bw.write(0, 1)
        bw.write(0b000001, 6)  # VERBATIM
        bw.write(0, 1)
        for v in xi.tolist():
            bw.write(int(v), _BPS)
        return
    bw.write(0, 1)
    bw.write(0b001000 | best_order, 6)  # FIXED, order in low bits
    bw.write(0, 1)
    for v in xi[:best_order].tolist():  # warmup samples, raw bps bits
        bw.write(int(v), _BPS)
    bw.write(0b00, 2)  # residual method: 4-bit rice
    bw.write(0, 4)  # partition order 0 -> one partition
    bw.write(k, 4)
    _rice_encode(bw, best_resid, k)


def encode_flac(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    block_size: int = 4096,
    lpc_order: int | None = None,
) -> bytes:
    """int16 mono PCM -> FLAC bytes (subset stream: fixed blocksize,
    rice partitions of order 0). Subframes are fixed-predictor by
    default; ``lpc_order`` switches to quantized-LPC subframes
    (Levinson-Durbin fit, spec precision/shift quantization), falling
    back to FIXED per block when the fit is degenerate."""
    x = np.asarray(samples, dtype=np.int16)
    n = len(x)
    # STREAMINFO
    si = _BitWriter()
    si.write(min(block_size, max(n, 16)), 16)  # min blocksize
    si.write(min(block_size, max(n, 16)), 16)  # max blocksize
    si.write(0, 24)  # min framesize unknown
    si.write(0, 24)  # max framesize unknown
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1 (mono)
    si.write(_BPS - 1, 5)
    si.write(n, 36)
    for _ in range(16):
        si.write(0, 8)  # md5 unknown
    info = si.bytes()
    head = bytearray(b"fLaC")
    head.append(0x80 | 0x00)  # last-metadata-block flag + STREAMINFO type
    head += len(info).to_bytes(3, "big")
    head += info
    # frames
    out = bytearray(head)
    for fno, lo in enumerate(range(0, n, block_size)):
        blk = x[lo : lo + block_size]
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)  # sync
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed-blocksize strategy
        bw.write(0b0111, 4)  # blocksize: 16-bit value at header end
        bw.write(0b0000, 4)  # sample rate: from STREAMINFO
        bw.write(0b0000, 4)  # channel assignment: mono
        bw.write(0b100, 3)  # sample size: 16 bits
        bw.write(0, 1)  # reserved
        _utf8_frame_number(bw, fno)
        bw.write(len(blk) - 1, 16)
        hdr = bw.out  # header bytes so far (bit-aligned: all fields above)
        bw.write(crc8(bytes(hdr)), 8)
        _encode_subframe(bw, blk, lpc_order=lpc_order)
        bw.align()
        bw.write(crc16(bytes(bw.out)), 16)
        out += bw.bytes()
    return bytes(out)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    extra = 0
    mask = 0x40
    while b0 & mask:
        extra += 1
        mask >>= 1
    if extra == 0 or extra > 6:
        raise ValueError("flac: malformed UTF-8 frame number")
    n = b0 & (mask - 1)
    for _ in range(extra):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: malformed UTF-8 continuation")
        n = (n << 6) | (c & 0x3F)
    return n


_BLOCKSIZE_TABLE = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}


def _decode_residual(br: _BitReader, blk_n: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    part_order = br.read(4)
    nparts = 1 << part_order
    if blk_n % nparts:
        raise ValueError("flac: partition count does not divide blocksize")
    out = []
    for p in range(nparts):
        n = blk_n // nparts - (order if p == 0 else 0)
        k = br.read(plen)
        if k == (1 << plen) - 1:  # escape: raw residuals
            bits = br.read(5)
            vals = np.array(
                [br.read(bits) for _ in range(n)], dtype=np.int64
            )
            sign = 1 << (bits - 1)
            out.append(np.where(vals & sign, vals - (1 << bits), vals))
        else:
            out.append(_rice_decode(br, n, k))
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _decode_subframe(br: _BitReader, blk_n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    typ = br.read(6)
    wasted = 0
    if br.read(1):  # wasted-bits-per-sample flag
        wasted = 1 + br.read_unary()
        bps -= wasted
    if typ == 0:  # CONSTANT
        v = _signed(br.read(bps), bps)
        x = np.full(blk_n, v, dtype=np.int64)
    elif typ == 1:  # VERBATIM
        x = np.array([_signed(br.read(bps), bps) for _ in range(blk_n)], dtype=np.int64)
    elif 0b001000 <= typ <= 0b001100:  # FIXED order 0-4
        order = typ & 0x07
        warm = np.array(
            [_signed(br.read(bps), bps) for _ in range(order)], dtype=np.int64
        )
        resid = _decode_residual(br, blk_n, order)
        x = _restore_fixed(warm, resid, order)
    elif typ & 0b100000:  # LPC
        order = (typ & 0x1F) + 1
        warm = np.array(
            [_signed(br.read(bps), bps) for _ in range(order)], dtype=np.int64
        )
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = _signed(br.read(5), 5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        coefs = np.array(
            [_signed(br.read(prec), prec) for _ in range(order)], dtype=np.int64
        )
        resid = _decode_residual(br, blk_n, order)
        x = np.concatenate([warm, np.zeros(len(resid), dtype=np.int64)])
        for i in range(order, blk_n):
            pred = int(np.dot(coefs, x[i - order : i][::-1]))
            x[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {typ:#08b}")
    return x << wasted


def _restore_fixed(warm: np.ndarray, resid: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-d difference: d cumsum passes, each seeded by the
    warmup cascade (vectorized — no per-sample python loop)."""
    if order == 0:
        return resid.copy()
    # difference cascade of the warmup: seeds[d] = last value at level d
    levels = [warm.astype(np.int64)]
    for _ in range(order):
        levels.append(np.diff(levels[-1]))
    x = resid.astype(np.int64)
    for d in range(order - 1, -1, -1):
        seed = levels[d][-1] if len(levels[d]) else 0
        x = seed + np.cumsum(x)
    return np.concatenate([warm.astype(np.int64), x])


def decode_flac(buf: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int16 mono samples, sample_rate). Verifies magic,
    STREAMINFO, per-frame CRC-8 and CRC-16, and every reserved bit."""
    if buf[:4] != b"fLaC":
        raise ValueError(f"flac: bad magic {buf[:4]!r}")
    pos = 4
    sample_rate = bps = None
    total = None
    # metadata blocks
    while True:
        hdr = buf[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = _BitReader(body)
            br.read(16), br.read(16), br.read(24), br.read(24)
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            if channels != 1 or bps != 16:
                raise ValueError(
                    f"flac: only mono/16-bit supported (ch={channels}, bps={bps})"
                )
        pos += 4 + blen
        if last:
            break
    if sample_rate is None:
        raise ValueError("flac: no STREAMINFO block")
    out = []
    got = 0
    while got < total:
        frame_start = pos
        br = _BitReader(buf, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError(f"flac: lost frame sync at byte {pos}")
        if br.read(1):
            raise ValueError("flac: reserved bit set in frame header")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved bit set in frame header")
        if chan != 0:
            raise ValueError(f"flac: only mono frames supported (chan={chan})")
        if ss_code != 0b100:
            raise ValueError(f"flac: only 16-bit frames supported ({ss_code:#05b})")
        _read_utf8_number(br)
        if bs_code == 0b0110:
            blk_n = br.read(8) + 1
        elif bs_code == 0b0111:
            blk_n = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_TABLE:
            blk_n = _BLOCKSIZE_TABLE[bs_code]
        else:
            raise ValueError(f"flac: reserved blocksize code {bs_code:#06b}")
        if sr_code == 0b0000:
            pass  # from STREAMINFO
        elif sr_code in (0b1100, 0b1101, 0b1110):
            br.read(8 if sr_code == 0b1100 else 16)
        elif sr_code == 0b1111:
            raise ValueError("flac: invalid sample-rate code")
        br.align()
        hdr_end = br.byte_pos()
        want = crc8(buf[frame_start : hdr_end])
        if br.read(8) != want:
            raise ValueError("flac: frame header CRC-8 mismatch")
        x = _decode_subframe(br, blk_n, 16)
        br.align()
        body_end = br.byte_pos()
        want16 = crc16(buf[frame_start:body_end])
        if br.read(16) != want16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = body_end + 2
        out.append(x)
        got += blk_n
    if not out:
        return np.empty(0, dtype=np.int16), sample_rate
    samples = np.concatenate(out)[:total]
    if samples.min() < -32768 or samples.max() > 32767:
        raise ValueError("flac: decoded samples exceed int16 range")
    return samples.astype(np.int16), sample_rate


# --------------------------------------------------------------------------
# pipeline stages (same contract as the WAV/ADPCM legs)
# --------------------------------------------------------------------------


def attach_flac_payloads(batch: pa.Table) -> pa.Table:
    """Fixture stage: attach real FLAC payloads carrying the SAME
    deterministic clip as the WAV leg — losslessness makes the raw-signal
    stats SQL the oracle."""
    ms = _ref_numbers(batch["media_ref"])
    payloads = [encode_flac(wav_signal(int(m))) for m in ms]
    batch = batch.append_column("payload", pa.array(payloads, type=pa.large_binary()))
    return batch.append_column(
        "media_kind",
        pa.array(np.full(batch.num_rows, "audio/flac"), type=pa.string()),
    )


class FlacDecoder:
    """Decode/extract stage (task-pooled with per-worker instance reuse via ``stateless_stage`` — an actor pool would pay its spin-up per query): REAL FLAC decode (both CRCs verified) +
    integer-exact clip statistics, same output schema as ``WavDecoder``
    so the two legs share one oracle."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_l, sr_l, s_l, ss_l = [], [], [], []
        for buf in batch["payload"].to_pylist():
            x, sr = decode_flac(buf)
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
