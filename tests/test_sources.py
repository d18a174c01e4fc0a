"""Source readers: streaming Lance fragment path (with a monkeypatched
fake lance module — the real package is absent here) and format dispatch.
The invariant under test: NO code path materializes a whole Lance dataset
on the driver; only the fragment-id list does."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ocr_ray.sources.readers as readers
from ocr_ray.testing import FakeFragment, FakeLanceModule


def _fragments(n_frags: int = 3, rows_per: int = 4):
    frags = []
    for i in range(n_frags):
        ids = np.arange(i * rows_per, (i + 1) * rows_per, dtype=np.int64)
        t = pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array([f"doc {j}" for j in ids], type=pa.string()),
                "extra": pa.array(ids * 2),
            }
        )
        frags.append(FakeFragment(i, t))
    return frags


@pytest.fixture()
def fake_lance(monkeypatch, tmp_path):
    frags = _fragments()
    mod = FakeLanceModule(frags)
    monkeypatch.setattr(readers, "lance", mod)
    monkeypatch.setattr(readers, "HAVE_LANCE", True)
    monkeypatch.setattr(readers, "PREFER_NATIVE_LANCE", False)  # force fragment path
    path = tmp_path / "corpus.lance"
    path.mkdir()
    return str(path), mod, frags


def test_lance_fragment_read_streams_all_rows(ray_session, fake_lance):
    path, mod, frags = fake_lance
    ds = readers.read_documents(path)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 12
    assert df["doc_id"].tolist() == list(range(12))
    # the driver only listed fragments; rows were read inside tasks
    assert set(df.columns) == {"doc_id", "text", "extra"}


def test_lance_fragment_read_prunes_columns(ray_session, fake_lance):
    path, mod, frags = fake_lance
    ds = readers.read_documents(path, columns=["doc_id", "text"])
    df = ds.to_pandas()
    assert set(df.columns) == {"doc_id", "text"}
    assert len(df) == 12


def test_lance_missing_package_raises(monkeypatch, tmp_path):
    monkeypatch.setattr(readers, "HAVE_LANCE", False)
    path = tmp_path / "corpus.lance"
    path.mkdir()
    with pytest.raises(ImportError, match="lance"):
        readers.read_documents(str(path))


def test_read_any_dispatch_parquet(ray_session, sf_smoke):
    ds = readers.read_any(f"{sf_smoke}/nation.parquet", columns=["n_nationkey"])
    assert ds.count() == 25


def test_read_parquet_evolved_aligns_schema_generations(tmp_path):
    import pyarrow.parquet as pq

    from ocr_ray.sources.readers import read_parquet_evolved

    # generation 1: (id, a); generation 2: (id, b) — a dropped, b added
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "a": pa.array(["x", "y"])}),
        tmp_path / "g1.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()), "b": pa.array([7.5], pa.float64())}),
        tmp_path / "g2.parquet",
    )
    ds = read_parquet_evolved(str(tmp_path))
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "a", "b"]
    assert df["a"].tolist()[:2] == ["x", "y"] and pd.isna(df["a"][2])
    assert pd.isna(df["b"][0]) and df["b"][2] == 7.5


def test_read_parquet_evolved_promotes_and_null_fills(tmp_path, ray_session):
    """Schema drift handling: int32->int64 promotion (narrowing casts used
    to crash mid-scan), null blocks for generations lacking every requested
    column, caller's column order, recursive partitioned layout, and loud
    errors for empty dirs / unknown columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from ocr_ray.sources.readers import read_parquet_evolved

    d = tmp_path / "corpus" / "part=0"
    d.mkdir(parents=True)
    big = 2**40
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int32()), "a": pa.array(["x", "y"])}),
        d / "gen1.parquet",
    )
    pq.write_table(
        pa.table({"id": pa.array([big], pa.int64()), "b": pa.array([7], pa.int64())}),
        d / "gen2.parquet",
    )

    out = read_parquet_evolved(str(tmp_path / "corpus")).to_pandas()
    assert sorted(int(v) for v in out["id"]) == [1, 2, big]  # promoted, not crashed
    assert out["b"].notna().sum() == 1 and out["a"].notna().sum() == 2

    # caller's column order wins; a gen with NO requested column yields nulls
    cols = read_parquet_evolved(str(tmp_path / "corpus"), columns=["b", "a"])
    assert cols.schema().names == ["b", "a"]
    df = cols.to_pandas()
    assert len(df) == 3 and df["b"].notna().sum() == 1

    with pytest.raises(FileNotFoundError):  # non-dir path = single file
        read_parquet_evolved(str(tmp_path / "nothing_here"))
    (tmp_path / "nothing_here").mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        read_parquet_evolved(str(tmp_path / "nothing_here"))
    with pytest.raises(ValueError, match="exist in no file"):
        read_parquet_evolved(str(tmp_path / "corpus"), columns=["typo"])


# --------------------------------------------------------------------------
# Interchange formats (ORC / Arrow IPC / gzipped JSONL)
# --------------------------------------------------------------------------


def _mixed_table(n: int = 20, seed: int = 0) -> pa.Table:
    ids = np.arange(seed, seed + n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array([f"row {j} é漢" for j in ids], type=pa.string()),
            "score": pa.array((ids * 0.25 + 0.01).astype(np.float64)),
        }
    )


def test_orc_roundtrip_multistripe(ray_session, tmp_path):
    """Multi-stripe ORC files fan out one task per stripe and reassemble
    every row; column pruning survives the stripe read."""
    import pyarrow.orc as orc

    from ocr_ray.sources.formats import read_orc, write_orc

    p = tmp_path / "orc_in"
    p.mkdir()
    # force several stripes in one file: the writer only cuts a stripe
    # once enough raw bytes accumulate, so pad the text column
    big = _mixed_table(20000)
    big = big.set_column(1, "text", pa.array([f"row {j} é漢" + "x" * 60 for j in range(20000)]))
    orc.write_table(big, str(p / "a.orc"), stripe_size=65536)
    orc.write_table(_mixed_table(50, seed=1000000), str(p / "b.orc"))
    assert orc.ORCFile(str(p / "a.orc")).nstripes > 1

    df = read_orc(str(p)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 20050
    assert df["doc_id"].tolist() == list(range(20000)) + list(range(1000000, 1000050))
    assert df.loc[0, "text"] == "row 0 é漢" + "x" * 60

    pruned = read_orc(str(p), columns=["doc_id"]).to_pandas()
    assert set(pruned.columns) == {"doc_id"}

    # sink: one part per block, manifest rows sum to input rows
    out = tmp_path / "orc_out"
    import ray.data

    man = write_orc(ray.data.from_arrow(_mixed_table(40)), str(out)).to_pandas()
    assert man["rows"].sum() == 40
    back = read_orc(str(out)).to_pandas().sort_values("doc_id")
    assert back["score"].tolist() == _mixed_table(40)["score"].to_pylist()


def test_ipc_roundtrip_batch_ranges(ray_session, tmp_path):
    """Arrow IPC files with many record batches read back via batch-range
    tasks; projection drops unread columns."""
    from ocr_ray.sources.formats import read_ipc, write_ipc

    p = tmp_path / "ipc_in"
    p.mkdir()
    t = _mixed_table(200)
    with pa.OSFile(str(p / "a.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, t.schema) as wr:
            for lo in range(0, 200, 10):  # 20 record batches -> 3 range tasks
                wr.write_table(t.slice(lo, 10))

    df = read_ipc(str(p)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 200
    assert df["text"].iloc[199] == "row 199 é漢"

    pruned = read_ipc(str(p), columns=["score"]).to_pandas()
    assert set(pruned.columns) == {"score"}

    import ray.data

    out = tmp_path / "ipc_out"
    man = write_ipc(ray.data.from_arrow(t), str(out)).to_pandas()
    assert man["rows"].sum() == 200
    assert len(read_ipc(str(out)).to_pandas()) == 200


def test_jsonl_gz_roundtrip_and_dispatch(ray_session, tmp_path):
    """Gzipped JSONL: block-parallel sink -> per-file gzip-codec ingest,
    unicode and float fidelity, and read_any dispatch on .jsonl.gz."""
    import ray.data

    from ocr_ray.sources.formats import read_jsonl_gz, write_jsonl_gz
    from ocr_ray.sources.readers import read_any

    t = _mixed_table(60)
    out = tmp_path / "jgz"
    man = write_jsonl_gz(ray.data.from_arrow(t), str(out)).to_pandas()
    assert man["rows"].sum() == 60

    df = read_jsonl_gz(str(out)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 60
    assert df["text"].iloc[5] == "row 5 é漢"
    assert df["score"].tolist() == t["score"].to_pylist()

    one = sorted(out.iterdir())[0]
    via_any = read_any(str(one), columns=["doc_id", "score"]).to_pandas()
    assert set(via_any.columns) == {"doc_id", "score"}


def test_read_any_dispatch_orc_ipc(ray_session, tmp_path):
    import pyarrow.orc as orc

    from ocr_ray.sources.readers import read_any

    t = _mixed_table(10)
    orc.write_table(t, str(tmp_path / "t.orc"))
    with pa.OSFile(str(tmp_path / "t.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, t.schema) as wr:
            wr.write_table(t)

    assert len(read_any(str(tmp_path / "t.orc")).to_pandas()) == 10
    assert len(read_any(str(tmp_path / "t.arrow")).to_pandas()) == 10
    with pytest.raises(ValueError, match="unsupported compressed"):
        read_any(str(tmp_path / "t.csv.gz"))


def _avro_torture_table() -> pa.Table:
    """Every supported Avro type with the wire format's edge cases:
    negative/large longs (zigzag), nulls in unions, empty + multibyte
    strings, raw bytes, float32 rounding, booleans."""
    return pa.table(
        {
            "l": pa.array([0, -1, 1, -(2**62), 2**62, None], type=pa.int64()),
            "i": pa.array([0, -5, 127, -128, 2**31 - 1, None], type=pa.int32()),
            "d": pa.array([0.0, -1.5, 3.14159, 1e300, -1e-300, None], type=pa.float64()),
            "f": pa.array([0.0, 0.5, -2.25, 1024.0, 0.125, None], type=pa.float32()),
            "s": pa.array(["", "a", "é漢字🎈", "line\nbreak", "x" * 300, None], type=pa.string()),
            "b": pa.array([b"", b"\x00\xff", b"abc", b"\x80", b"\x7f" * 40, None], type=pa.binary()),
            "t": pa.array([True, False, True, None, False, True], type=pa.bool_()),
        }
    )


def test_avro_roundtrip_bit_exact(ray_session, tmp_path):
    """write_avro -> read_avro reproduces every value of every supported
    type exactly, through both codecs and multi-block files."""
    from ocr_ray.sources.avro import read_avro, write_avro_file

    t = _avro_torture_table()
    big = pa.concat_tables([t] * 50)  # 300 rows
    for codec in ("deflate", "null"):
        f = tmp_path / f"t_{codec}.avro"
        # rows_per_block=64 forces several blocks -> exercises the
        # driver-side block index + per-range task decode
        write_avro_file(big, str(f), codec=codec, rows_per_block=64)
        back = read_avro(str(f)).to_pandas()
        src = big.to_pandas()
        # row order is preserved within a single file read
        pd.testing.assert_frame_equal(back, src)


def test_avro_block_parallel_sink_and_pruning(ray_session, tmp_path):
    """Block-parallel sink writes one part per block; directory read
    reassembles all rows; column pruning keeps only asked columns."""
    import ray

    from ocr_ray.sources.avro import read_avro, write_avro

    t = _mixed_table(200)
    ds = ray.data.from_arrow(t).repartition(4)
    out = tmp_path / "avro_dir"
    manifest = write_avro(ds, str(out)).to_pandas()
    assert manifest["rows"].sum() == 200
    assert len(manifest) == 4

    back = read_avro(str(out)).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(back, t.to_pandas())

    pruned = read_avro(str(out), columns=["doc_id"]).to_pandas()
    assert list(pruned.columns) == ["doc_id"]
    assert len(pruned) == 200


def test_avro_read_any_dispatch(ray_session, tmp_path):
    from ocr_ray.sources.avro import write_avro_file
    from ocr_ray.sources.readers import read_any

    f = tmp_path / "t.avro"
    write_avro_file(_mixed_table(10), str(f))
    assert len(read_any(str(f)).to_pandas()) == 10


def test_avro_unsupported_schema_is_loud(tmp_path):
    from ocr_ray.sources.avro import write_avro_file

    t = pa.table({"x": pa.array([[1, 2]], type=pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="unsupported Arrow type"):
        write_avro_file(t, str(tmp_path / "bad.avro"))


# --------------------------------------------------------------------------
# TFRecord (CRC32C framing + tf.train.Example protobuf)
# --------------------------------------------------------------------------


def _torture_table() -> pa.Table:
    return pa.table(
        {
            "s": pa.array(["héllo 漢", None, "", "x" * 300, "tab\tnl\n"], pa.string()),
            "b": pa.array([b"\x00\xff", b"", None, b"abc", bytes(range(32))], pa.binary()),
            "i": pa.array([-(2**63), 2**63 - 1, None, 0, -1], pa.int64()),
            "f": pa.array([0.25, -1.5, 3.0, None, 1024.125], pa.float64()),
            "k": pa.array([True, False, None, True, False], pa.bool_()),
        }
    )


def test_tfrecord_crc32c_vectors():
    """Known-answer tests for the Castagnoli CRC and the TFRecord mask."""
    from ocr_ray.sources.tfrecord import crc32c, masked_crc32c

    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283  # canonical check value
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert masked_crc32c(b"") == (0xA282EAD8 & 0xFFFFFFFF)


def test_tfrecord_roundtrip_bit_exact(ray_session, tmp_path):
    """write -> distributed read reproduces every supported type incl.
    int64 extremes, unicode, empty strings/bytes and nulls (nulls ride as
    absent features). Floats here are float32-exact by construction."""
    from ocr_ray.sources.tfrecord import read_tfrecord, write_tfrecord_file

    t = _torture_table()
    big = pa.concat_tables([t] * 40)
    f = tmp_path / "t.tfrecord"
    write_tfrecord_file(big, str(f))
    back = read_tfrecord(str(f), big.schema).to_pandas()
    ref = big.to_pandas()
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), ref.reset_index(drop=True)
    )


def test_tfrecord_crc_detects_corruption(ray_session, tmp_path):
    """A flipped payload byte fails the record CRC loudly on read."""
    from ocr_ray.sources.tfrecord import read_tfrecord, write_tfrecord_file

    t = _mixed_table(50)
    f = tmp_path / "c.tfrecord"
    write_tfrecord_file(t, str(f))
    raw = bytearray(f.read_bytes())
    raw[len(raw) // 2] ^= 0xFF  # may hit payload (CRC) or a length field
    f.write_bytes(bytes(raw))
    with pytest.raises(Exception, match="CRC mismatch|truncated record"):
        read_tfrecord(str(f), t.schema).materialize()
    # flip strictly inside the first record's payload -> data CRC catches
    raw2 = bytearray(f.read_bytes())
    raw2[len(raw2) // 2] ^= 0xFF  # restore
    raw2[14] ^= 0xFF
    f.write_bytes(bytes(raw2))
    with pytest.raises(Exception, match="CRC mismatch"):
        read_tfrecord(str(f), t.schema).materialize()


def test_tfrecord_block_parallel_sink_and_pruning(ray_session, tmp_path):
    """Sink writes one file per block; the dir read fans out per file and
    reassembles all rows; column selection prunes the output schema."""
    import ray.data

    from ocr_ray.sources.tfrecord import read_tfrecord, write_tfrecord

    t = _mixed_table(60)
    ds = ray.data.from_arrow(t).repartition(4)
    out = tmp_path / "tfr_dir"
    manifest = write_tfrecord(ds, str(out)).to_pandas()
    assert len(manifest) == 4 and manifest["rows"].sum() == 60
    back = (
        read_tfrecord(str(out), t.schema)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(back, t.to_pandas())
    pruned = read_tfrecord(str(out), t.schema, columns=["doc_id"]).to_pandas()
    assert list(pruned.columns) == ["doc_id"] and len(pruned) == 60


# --------------------------------------------------------------------------
# WebDataset sharded tar
# --------------------------------------------------------------------------


def test_webdataset_roundtrip_all_types(ray_session, tmp_path):
    """Shard write -> per-shard distributed read reproduces string /
    binary / int64 / float64 / bool exactly (floats via repr text — no
    float32 leg here) with nulls as absent members."""
    from ocr_ray.sources.webdataset import read_webdataset, write_webdataset_shard

    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9, 10], pa.int64()),
            "text": pa.array(["héllo 漢", None, "", "x" * 200], pa.string()),
            "payload": pa.array([b"\x00\xffbin", b"", None, b"zz"], pa.binary()),
            "score": pa.array([0.1234567890123, -1e-300, 2.0, None], pa.float64()),
            "flag": pa.array([True, None, False, True], pa.bool_()),
        }
    )
    f = tmp_path / "s.tar"
    write_webdataset_shard(t, str(f), key_column="doc_id")
    back = (
        read_webdataset(str(f), t.schema)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(back, t.to_pandas())


def test_webdataset_sharded_sink_pruning_and_key(ray_session, tmp_path):
    """One tar shard per block; pruned read returns only selected columns
    (media member payloads skipped via tar size headers); the sample key
    basename is exposable as a column."""
    import ray.data

    from ocr_ray.sources.webdataset import read_webdataset, write_webdataset

    t = _mixed_table(40)
    ds = ray.data.from_arrow(t).repartition(5)
    out = tmp_path / "wds"
    manifest = write_webdataset(ds, str(out), key_column="doc_id").to_pandas()
    assert len(manifest) == 5 and manifest["rows"].sum() == 40
    back = (
        read_webdataset(str(out), t.schema)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(back, t.to_pandas())
    pruned = read_webdataset(
        str(out), t.schema, columns=["doc_id", "score"]
    ).to_pandas()
    assert list(pruned.columns) == ["doc_id", "score"] and len(pruned) == 40
    keyed = read_webdataset(
        str(out), t.schema, columns=["doc_id"], key_column="__key__"
    )
    # key_column not in schema -> only doc_id requested comes back typed
    assert set(keyed.to_pandas().columns) == {"doc_id"}


def test_tfrecord_webdataset_read_any_is_loud(tmp_path):
    """read_any refuses schema-less TFRecord/tar paths with a pointer to
    the dedicated readers."""
    from ocr_ray.sources import read_any

    with pytest.raises(ValueError, match="pyarrow schema"):
        read_any(str(tmp_path / "x.tfrecord"))
    with pytest.raises(ValueError, match="pyarrow schema"):
        read_any(str(tmp_path / "x.tar"))


def test_tfrecord_crc_many_skewed_lengths():
    """The lockstep CRC kernel routes length outliers through the scalar
    path (regression: one giant record padded every row to its length)
    and still returns exact CRCs for all records."""
    from ocr_ray.sources.tfrecord import masked_crc32c, masked_crc32c_many

    recs = [bytes([i % 251]) * (10 + i % 30) for i in range(500)]
    recs.insert(123, b"\xab" * 300_000)  # ~10^4x the mean length
    got = masked_crc32c_many(recs)
    for i in (0, 123, 124, 499, 250):
        assert int(got[i]) == masked_crc32c(recs[i])


def test_webdataset_sink_refuses_unrepresentable_rows(tmp_path):
    """All-null rows and duplicate keys would silently lose/merge samples
    on read — the sink refuses them loudly."""
    from ocr_ray.sources.webdataset import write_webdataset_shard

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a", None], pa.string()),
            "aux": pa.array([b"x", None], pa.binary()),
        }
    )
    # row 2: doc_id member still written (key col is a column too) -> fine
    write_webdataset_shard(t, str(tmp_path / "ok.tar"), key_column="doc_id")

    allnull = pa.table(
        {
            "text": pa.array(["a", None], pa.string()),
            "aux": pa.array([b"x", None], pa.binary()),
        }
    )
    with pytest.raises(ValueError, match="entirely null"):
        write_webdataset_shard(allnull, str(tmp_path / "bad.tar"), key_column=None)

    dup = pa.table(
        {"doc_id": pa.array([7, 7], pa.int64()), "text": pa.array(["a", "b"])}
    )
    with pytest.raises(ValueError, match="duplicate"):
        write_webdataset_shard(dup, str(tmp_path / "dup.tar"), key_column="doc_id")


def test_tfrecord_uint64_beyond_int63(tmp_path):
    """Regression: uint64 values >= 2^63 encode as raw 64-bit varints
    (the int64 cast used to crash the vectorized path)."""
    from ocr_ray.sources.tfrecord import (
        _decode_example,
        _iter_records,
        write_tfrecord_file,
    )

    t = pa.table({"u": pa.array([2**63 + 5, 1, 2**64 - 1, None], pa.uint64())})
    f = tmp_path / "u.tfrecord"
    write_tfrecord_file(t, str(f))
    rows = [
        _decode_example(r) for r in _iter_records(f.read_bytes(), str(f), True)
    ]
    # the wire carries two's-complement int64; re-fold to uint64
    got = [None if "u" not in r else (r["u"] & (2**64 - 1)) for r in rows]
    assert got == [2**63 + 5, 1, 2**64 - 1, None]
