"""Unit tests for the round-3 compressed-media codecs: PNG (DEFLATE via
stdlib zlib, stages/png.py) and IMA-ADPCM (stages/adpcm.py).

Both codecs are REAL end-to-end implementations; these tests cover the
codec internals (round trips, filter/unfilter paths, container framing,
error handling, lockstep-vs-scalar kernel equivalence). The end-to-end
pipeline correctness is covered by the bit-exact oracles in
tests/test_queries_oracle.py (``media_png_features`` /
``media_adpcm_features``)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from ocr_ray.stages.adpcm import (
    ADPCM_N,
    adpcm_signal,
    attach_adpcm_payloads,
    decode_adpcm_wav,
    decode_ima_codes,
    decode_ima_lockstep,
    encode_adpcm_wav,
    encode_ima_codes,
    parse_adpcm_wav,
)
from ocr_ray.stages.png import (
    PNG_SIGNATURE,
    attach_png_payloads,
    decode_png,
    encode_png,
    png_image,
)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(8, 16, 3), (1, 1, 3), (5, 7, 3), (32, 33, 3), (8, 16), (3, 1), (64, 64)]
)
def test_png_roundtrip_random(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_png_roundtrip_fixture_lossless():
    for m in (0, 1, 123, 9972):
        img = png_image(m)
        assert np.array_equal(decode_png(encode_png(img)), img)


def _idat(buf: bytes) -> bytes:
    pos, idat = 8, b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        if buf[pos + 4 : pos + 8] == b"IDAT":
            idat += buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
    return idat


def test_png_adaptive_filtering_exercises_all_five_types():
    """The encoder's min-|signed| heuristic must actually pick every
    filter type across mixed content — that's what makes the decoder's
    five unfilter paths load-bearing in the oracle-checked query."""
    rng = np.random.default_rng(7)
    used: set[int] = set()

    def row_filters(img: np.ndarray) -> set[int]:
        buf = encode_png(img)
        raw = zlib.decompress(_idat(buf))
        channels = 1 if img.ndim == 2 else 3
        stride = img.shape[1] * channels + 1
        return {raw[i] for i in range(0, len(raw), stride)}

    for m in range(40):
        used |= row_filters(png_image(m))
    used |= row_filters(rng.integers(0, 256, (30, 30, 3), dtype=np.uint8))
    y, x = np.mgrid[0:40, 0:40]
    used |= row_filters(((x + y) // 2 % 256).astype(np.uint8))
    assert used == {0, 1, 2, 3, 4}, used


def test_png_decoder_rejects_corruption():
    img = png_image(5)
    good = encode_png(img)
    # flipped byte in IEND CRC
    bad = bytearray(good)
    bad[-5] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # flipped byte inside IDAT body (CRC catches it before inflate)
    bad = bytearray(good)
    bad[8 + 25 + 12] ^= 0x01  # inside the IDAT chunk body
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:20])
    with pytest.raises(ValueError, match="IHDR or IEND"):
        decode_png(PNG_SIGNATURE)


def test_png_decoder_multi_idat_and_ancillary_chunks():
    """Spec features the encoder never emits: IDAT split across chunks
    and an ancillary chunk between them must still decode."""
    img = png_image(9)
    buf = encode_png(img)
    # re-frame: split the single IDAT into two, insert a tEXt chunk
    pos, chunks = 8, []
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        chunks.append((buf[pos + 4 : pos + 8], buf[pos + 8 : pos + 8 + length]))
        pos += 12 + length

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    out = bytearray(PNG_SIGNATURE)
    for tag, body in chunks:
        if tag == b"IDAT":
            mid = len(body) // 2
            out += chunk(b"IDAT", body[:mid])
            out += chunk(b"tEXt", b"comment\x00split stream")
            out += chunk(b"IDAT", body[mid:])
        else:
            out += chunk(tag, body)
    assert np.array_equal(decode_png(bytes(out)), img)


def test_png_encoder_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((4, 4), dtype=np.int32))
    with pytest.raises(ValueError, match="shape|image"):
        encode_png(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(ValueError, match="empty"):
        encode_png(np.zeros((0, 4), dtype=np.uint8))


def test_png_attach_payloads_schema():
    import pyarrow as pa

    batch = pa.table(
        {"doc_id": ["doc-1", "doc-2"], "media_ref": ["m-3", "m-17"]}
    )
    out = attach_png_payloads(batch)
    assert out["media_kind"].to_pylist() == ["image/png", "image/png"]
    for ref, payload in zip(("m-3", "m-17"), out["payload"].to_pylist()):
        assert np.array_equal(decode_png(payload), png_image(int(ref[2:])))


# ---------------------------------------------------------------------------
# IMA-ADPCM
# ---------------------------------------------------------------------------


def test_adpcm_container_roundtrip_codes():
    rng = np.random.default_rng(11)
    for n in (2, 33, 64, 100):
        s = rng.integers(-32768, 32768, n).astype(np.int16)
        p0, i0, codes, rate = parse_adpcm_wav(encode_adpcm_wav(s))
        ep0, ecodes = encode_ima_codes(s)
        assert (p0, i0, rate) == (ep0, 0, 8000)
        assert np.array_equal(codes, ecodes)


def test_adpcm_lockstep_matches_scalar_reference():
    rng = np.random.default_rng(13)
    nstream, k = 23, 63
    codes = rng.integers(0, 16, (nstream, k)).astype(np.uint8)
    p0 = rng.integers(-32768, 32768, nstream)
    i0 = rng.integers(0, 89, nstream)
    lock = decode_ima_lockstep(p0, codes, i0)
    for j in range(nstream):
        assert np.array_equal(
            lock[j], decode_ima_codes(int(p0[j]), codes[j], int(i0[j]))
        ), j


def test_adpcm_tracks_smooth_signal():
    """ADPCM is lossy but adaptive: on a smooth signal the decoded wave
    must track the input closely (sanity that the step adaptation and
    sign handling actually work, not just round-trip bookkeeping)."""
    t = np.arange(256)
    s = (8000 * np.sin(t / 10)).astype(np.int16)
    dec, _ = decode_adpcm_wav(encode_adpcm_wav(s))
    err = np.abs(dec.astype(np.int64) - s.astype(np.int64))
    assert err.mean() < 300 and np.median(err) < 200


def test_adpcm_clamp_paths():
    """Full-scale square wave slams both int16 clamps and the index
    clamps; decode must stay in range and still match the reference."""
    s = np.tile(np.array([32767, -32768], dtype=np.int16), 50)
    buf = encode_adpcm_wav(s)
    dec, _ = decode_adpcm_wav(buf)
    assert dec.min() >= -32768 and dec.max() <= 32767
    p0, i0, codes, _ = parse_adpcm_wav(buf)
    assert np.array_equal(dec, decode_ima_codes(p0, codes, i0))


def test_adpcm_parser_rejects_corruption():
    buf = encode_adpcm_wav(adpcm_signal(7))
    with pytest.raises(ValueError, match="RIFF"):
        parse_adpcm_wav(b"XIFF" + buf[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_adpcm_wav(buf[:-3])
    # PCM16 payload must be rejected by the ADPCM parser (wrong fmt tag)
    from ocr_ray.stages.media import encode_wav, wav_signal

    with pytest.raises(ValueError, match="IMA-ADPCM"):
        parse_adpcm_wav(encode_wav(wav_signal(7)))


def test_adpcm_decoder_stage_lockstep_and_ragged():
    import pyarrow as pa

    from ocr_ray.stages.adpcm import AdpcmDecoder

    batch = pa.table({"doc_id": ["d1", "d2", "d3"], "media_ref": ["m-1", "m-2", "m-3"]})
    out = AdpcmDecoder()(attach_adpcm_payloads(batch))
    assert out["n_samples"].to_pylist() == [ADPCM_N] * 3
    # per-row expectation from the scalar reference decoder
    for i, ref in enumerate(("m-1", "m-2", "m-3")):
        dec, _ = decode_adpcm_wav(encode_adpcm_wav(adpcm_signal(int(ref[2:]))))
        d = dec.astype(np.int64)
        assert out["sum_amp"][i].as_py() == int(d.sum())
        assert out["sum_sq"][i].as_py() == int((d * d).sum())
    # ragged batch (different clip lengths) exercises the fallback path
    rng = np.random.default_rng(5)
    clips = [rng.integers(-2000, 2000, n).astype(np.int16) for n in (10, 64)]
    ragged = pa.table(
        {
            "doc_id": ["d1", "d2"],
            "media_ref": ["m-1", "m-2"],
            "payload": pa.array(
                [encode_adpcm_wav(c) for c in clips], type=pa.large_binary()
            ),
        }
    )
    out = AdpcmDecoder()(ragged)
    assert out["n_samples"].to_pylist() == [10, 64]
    for i, c in enumerate(clips):
        d = decode_adpcm_wav(encode_adpcm_wav(c))[0].astype(np.int64)
        assert out["sum_amp"][i].as_py() == int(d.sum())


def test_adpcm_multi_block_round_trip():
    from ocr_ray.stages.adpcm import (
        adpcm_signal,
        decode_adpcm_wav,
        encode_adpcm_wav,
        parse_adpcm_blocks,
        parse_adpcm_wav,
    )

    s = np.concatenate([adpcm_signal(3), adpcm_signal(9)]).astype(np.int16)[:100]
    buf = encode_adpcm_wav(s, samples_per_block=16)
    blocks, rate = parse_adpcm_blocks(buf)
    assert len(blocks) == 7  # 6 full blocks of 16 + 4-sample tail
    # Every block header stores that block's first sample verbatim, and
    # the step index carries across block boundaries (encoder state).
    for k, (pred0, idx0, codes) in enumerate(blocks):
        assert pred0 == int(s[16 * k])
        assert len(codes) == (15 if k < 6 else 3)
    assert blocks[0][1] == 0 and any(b[1] != 0 for b in blocks[1:])
    dec, r = decode_adpcm_wav(buf)
    assert r == rate and len(dec) == 100
    assert all(int(dec[16 * k]) == int(s[16 * k]) for k in range(7))
    # The single-block convenience parse refuses multi-block input loudly.
    with pytest.raises(ValueError):
        parse_adpcm_wav(buf)
    # Single-block files still round-trip through the same path.
    one = encode_adpcm_wav(s)
    assert len(parse_adpcm_blocks(one)[0]) == 1
    assert len(decode_adpcm_wav(one)[0]) == 100


def test_adpcm_odd_data_chunk_gets_riff_pad_byte():
    """Review regression: an odd-sized data chunk must be followed by the
    RIFF pad byte (excluded from the chunk size, included in the RIFF
    size), so strict consumers and any chunk appended later stay
    word-aligned. Decode is unaffected."""
    rng = np.random.default_rng(5)
    samples = (rng.integers(-2000, 2000, size=13)).astype(np.int16)
    # spb=6 -> block_align 4 + 3 = 7 (odd); 3 blocks -> odd data chunk
    buf = encode_adpcm_wav(samples, samples_per_block=6)
    di = buf.index(b"data")
    sz = int.from_bytes(buf[di + 4 : di + 8], "little")
    assert sz % 2 == 1  # the premise: an odd data chunk
    assert buf[di + 8 + sz :] == b"\x00"  # exactly one trailing pad byte
    riff_sz = int.from_bytes(buf[4:8], "little")
    assert riff_sz == len(buf) - 8  # RIFF size counts the pad
    from ocr_ray.stages.adpcm import parse_adpcm_blocks

    blocks, rate = parse_adpcm_blocks(buf)
    assert sum(1 + len(c) for _, _, c in blocks) >= len(samples)
    dec, _rate = decode_adpcm_wav(buf)
    assert len(dec) == len(samples)


# ---------------------------------------------------------------------------
# GIF87a / LZW
# ---------------------------------------------------------------------------


def test_gif_roundtrip_fixture_and_random():
    from ocr_ray.stages.gif import decode_gif, encode_gif, gif_image

    for m in (0, 1, 7, 123, 9972):
        img = gif_image(m)
        rgb = decode_gif(encode_gif(img))
        assert rgb.shape == (img.shape[0], img.shape[1], 3)
        assert (rgb == img[:, :, None]).all()
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, (120, 250), dtype=np.uint8)
    assert (decode_gif(encode_gif(big))[:, :, 1] == big).all()


def test_gif_lzw_width_growth_and_dict_reset():
    """Random bytes force the code width through 9->12 bits and past the
    4096-entry CLEAR/reset; runs exercise long dictionary chains and the
    KwKwK decode case (aaaa... emits codes not yet in the table)."""
    from ocr_ray.stages.gif import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(noise), 8, len(noise)) == noise
    runs = b"a" * 5000 + b"abcd" * 8000 + bytes(range(256)) * 40
    assert _lzw_decode(_lzw_encode(runs), 8, len(runs)) == runs
    assert _lzw_decode(_lzw_encode(b"aaaaaaa"), 8, 7) == b"aaaaaaa"


def test_gif_decoder_rejects_corruption():
    from ocr_ray.stages.gif import decode_gif, encode_gif, gif_image

    buf = bytearray(encode_gif(gif_image(5)))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + bytes(buf[6:]))
    # truncate the LZW stream inside the first sub-block
    with pytest.raises(ValueError):
        decode_gif(bytes(buf[: 13 + 768 + 10 + 1 + 3]))
    # flip the interlace bit in the image descriptor packed byte
    tampered = bytearray(buf)
    tampered[13 + 768 + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(tampered))


def test_gif_skips_extension_blocks():
    """GIF89a files carry extension blocks before the image; the decoder
    walks them (label + sub-blocks) instead of choking."""
    from ocr_ray.stages.gif import decode_gif, encode_gif, gif_image

    img = gif_image(9)
    buf = bytearray(encode_gif(img))
    # splice a graphic-control extension after the color table
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    at = 13 + 768
    spliced = bytes(buf[:at]) + ext + bytes(buf[at:])
    assert (decode_gif(spliced)[:, :, 0] == img).all()


def test_gif_attach_payloads_schema():
    import pyarrow as pa

    from ocr_ray.stages.gif import GifDecoder, attach_gif_payloads

    batch = pa.table(
        {
            "doc_id": pa.array(["doc-00000001", "doc-00000002"]),
            "media_ref": pa.array(["m-17", "m-4242"]),
        }
    )
    with_payload = attach_gif_payloads(batch)
    assert with_payload["media_kind"].to_pylist() == ["image/gif"] * 2
    out = GifDecoder()(with_payload)
    assert out["width"].to_pylist() == [16, 16]
    assert out["height"].to_pylist() == [8, 8]
    from ocr_ray.stages.gif import gif_image

    g = gif_image(17)
    assert out["mean_gray"][0].as_py() == g.sum() / 128.0
    assert out["first_px"].to_pylist() == [int(gif_image(17)[0, 0]), int(gif_image(4242)[0, 0])]


# --------------------------------------------------------------------------
# FLAC (lossless: fixed-predictor subset, Rice residuals, dual CRC)
# --------------------------------------------------------------------------


def test_flac_roundtrip_fixture_and_torture():
    """encode -> decode is the identity over the fixture clips and a
    torture set spanning every subframe type (constant, verbatim-forced
    noise, ramps that pick each fixed order, multi-frame streams,
    single-sample and full-scale alternating signals)."""
    from ocr_ray.stages.flac import decode_flac, encode_flac
    from ocr_ray.stages.media import wav_signal

    for m in (0, 1, 17, 4242, 9972):
        x = wav_signal(m)
        y, sr = decode_flac(encode_flac(x))
        assert sr == 8000 and np.array_equal(x, y)

    rng = np.random.default_rng(7)
    cases = [
        np.zeros(64, np.int16),
        np.full(100, -32768, np.int16),
        rng.integers(-32768, 32768, size=500).astype(np.int16),
        np.arange(-200, 300, dtype=np.int16),
        (1000 * np.sin(np.arange(10000) / 10)).astype(np.int16),
        np.array([5], np.int16),
        np.array([32767, -32768] * 50, np.int16),
    ]
    for x in cases:
        y, sr = decode_flac(encode_flac(x, sample_rate=44100))
        assert sr == 44100 and np.array_equal(x, y)


def test_flac_compresses_the_fixture():
    """The fixture clip is mostly second-difference-flat, so the stream
    must come out SMALLER than raw PCM — proves the rice path is actually
    taken, not the verbatim escape."""
    from ocr_ray.stages.flac import encode_flac
    from ocr_ray.stages.media import wav_signal

    x = wav_signal(17)
    assert len(encode_flac(x)) < len(x) * 2  # raw PCM16 = 2 bytes/sample


def test_flac_crc_catches_frame_corruption():
    """Every byte-flip inside frame bytes raises (CRC-8 header or CRC-16
    frame); only the documented ignore-fields of STREAMINFO (min/max
    framesize, md5) may decode unchanged."""
    from ocr_ray.stages.flac import decode_flac, encode_flac
    from ocr_ray.stages.media import wav_signal

    x = wav_signal(17)
    buf = bytearray(encode_flac(x))
    frame_start = 4 + 4 + 34  # magic + block header + STREAMINFO
    silent_wrong = 0
    for pos in range(frame_start, len(buf)):
        bad = bytearray(buf)
        bad[pos] ^= 0xFF
        try:
            y, _ = decode_flac(bytes(bad))
            if not np.array_equal(x, y):
                silent_wrong += 1
        except Exception:
            pass
    assert silent_wrong == 0


def test_flac_rejects_malformed_streams():
    from ocr_ray.stages.flac import decode_flac, encode_flac
    from ocr_ray.stages.media import wav_signal

    with pytest.raises(ValueError, match="bad magic"):
        decode_flac(b"RIFF" + b"\x00" * 40)
    buf = bytearray(encode_flac(wav_signal(3)))
    buf[4 + 4 + 12] = 0xFF  # STREAMINFO bits 96-103: sr low bits + channels
    with pytest.raises(ValueError):
        decode_flac(bytes(buf))


def test_flac_decoder_stage_matches_wav_stats(ray_session):
    """FlacDecoder over attached payloads reproduces the WavDecoder stats
    exactly (same clips, lossless codec => same integer statistics)."""
    import pyarrow as pa

    from ocr_ray.stages.flac import FlacDecoder, attach_flac_payloads
    from ocr_ray.stages.media import WavDecoder, attach_wav_payloads

    base = pa.table(
        {
            "doc_id": pa.array(["doc-1", "doc-2", "doc-3"]),
            "media_ref": pa.array(["m-17", "m-101", "m-9972"]),
        }
    )
    flac_out = FlacDecoder()(attach_flac_payloads(base)).to_pandas()
    wav_out = WavDecoder()(attach_wav_payloads(base)).to_pandas()
    pd.testing.assert_frame_equal(flac_out, wav_out)


def test_flac_lpc_subframes_roundtrip():
    """Quantized-LPC encode (Levinson-Durbin fit, spec precision/shift)
    round-trips losslessly at several orders, beats the fixed predictors
    on a smooth signal, and falls back to FIXED on degenerate fits
    (regression: the LPC decode slice was empty at i == order)."""
    from ocr_ray.stages.flac import decode_flac, encode_flac
    from ocr_ray.stages.media import wav_signal

    rng = np.random.default_rng(1)
    smooth = (3000 * np.sin(np.arange(5000) / 20) + rng.normal(0, 20, 5000)).astype(
        np.int16
    )
    cases = [
        wav_signal(17),
        smooth,
        rng.integers(-32768, 32768, 300).astype(np.int16),
        np.zeros(64, np.int16),  # constant: LPC request falls back
        np.arange(100, dtype=np.int16),
    ]
    for order in (1, 4, 8):
        for x in cases:
            y, _ = decode_flac(encode_flac(x, lpc_order=order))
            assert np.array_equal(x, y), order
    assert len(encode_flac(smooth, lpc_order=8)) < len(encode_flac(smooth))


def test_flac_utf8_frame_numbers_all_widths():
    """The UTF-8-style frame-number code round-trips through every byte
    width up to the 36-bit ceiling (regression: >= 0x10000 overflowed
    the 3-byte form)."""
    from ocr_ray.stages.flac import (
        _BitReader,
        _BitWriter,
        _read_utf8_number,
        _utf8_frame_number,
    )

    for n in [0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 2**20, 2**30, 2**35]:
        bw = _BitWriter()
        _utf8_frame_number(bw, n)
        bw.align()
        assert _read_utf8_number(_BitReader(bw.bytes())) == n, n
    with pytest.raises(ValueError, match="36-bit"):
        _utf8_frame_number(_BitWriter(), 2**36)


def test_flac_empty_stream_roundtrip():
    from ocr_ray.stages.flac import decode_flac, encode_flac

    y, sr = decode_flac(encode_flac(np.array([], dtype=np.int16)))
    assert len(y) == 0 and sr == 8000


def test_png_lockstep_unfilter_matches_scalar():
    """The batch lockstep unfilter is bit-identical to per-image decode
    across all five filter types (random, fixture, gradient and gray
    images), and the decoder stage picks it for same-shape batches."""
    import pyarrow as pa

    from ocr_ray.stages.png import (
        PngDecoder,
        attach_png_payloads,
        parse_png_raw,
        unfilter_lockstep,
    )

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (8, 16, 3), dtype=np.uint8) for _ in range(10)]
    imgs += [png_image(m) for m in range(10)]
    y, x = np.mgrid[0:8, 0:16]
    imgs.append(
        np.repeat((((x + y) // 2) % 256).astype(np.uint8)[:, :, None], 3, axis=2)
    )
    bufs = [encode_png(i) for i in imgs]
    parsed = [parse_png_raw(b) for b in bufs]
    stack = unfilter_lockstep([p[0] for p in parsed], *parsed[0][1:])
    for i, img in enumerate(imgs):
        assert np.array_equal(stack[i], decode_png(bufs[i])), i

    grays = [rng.integers(0, 256, (8, 16), dtype=np.uint8) for _ in range(4)]
    pg = [parse_png_raw(encode_png(g)) for g in grays]
    sg = unfilter_lockstep([p[0] for p in pg], *pg[0][1:])
    assert all(np.array_equal(sg[i], grays[i]) for i in range(4))

    # stage equivalence over the fixture payload path
    base = pa.table(
        {"doc_id": ["doc-1", "doc-2"], "media_ref": ["m-3", "m-17"]}
    )
    out = PngDecoder()(attach_png_payloads(base)).to_pandas()
    for ref, mr, mg, mb in zip(("m-3", "m-17"), out["mean_r"], out["mean_g"], out["mean_b"]):
        img = png_image(int(ref[2:])).reshape(-1, 3)
        want = img.sum(axis=0, dtype=np.int64) / float(img.shape[0])
        assert np.allclose([mr, mg, mb], want)
