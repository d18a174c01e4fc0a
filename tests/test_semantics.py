"""Reference-semantics fixture families not covered elsewhere
(FIXTURES.md): f_null_spans (NULL_GUID-slot analogue), f_fanout (sticky
fan-out), f_latch (count barrier), f_schema_fail (MustFailRun analogue)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ocr_ray.pipelines.extract import extract_documents
from ocr_ray.schema import (
    SPAN_STRUCT,
    SchemaError,
    docs_table_to_dict,
    validate_documents_schema,
    validate_spans_schema,
)


def _corpus(rows: list[tuple[str, list[dict]]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "spans": pa.array([r[1] for r in rows], type=pa.large_list(SPAN_STRUCT)),
        }
    )


def _span(kind="text", text="w", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# --------------------------------------------------------------------------
# f_null_spans — empty docs, single-span docs, all-stripped docs must all
# reappear exactly once (the doc sentinel is the per-scope completion token)
# --------------------------------------------------------------------------


def test_degenerate_docs_survive_extraction():
    corpus = _corpus(
        [
            ("empty", []),
            ("single", [_span(text="only")]),
            ("all-boiler", [_span("boilerplate", "x", offset=0), _span("boilerplate", "y", offset=1)]),
            ("only-media", [_span("media", "", "m-1", 0)]),
            ("ws-only", [_span(text="   ")]),  # trims to empty -> dropped
        ]
    )
    out = extract_documents(rd.from_arrow(corpus), num_buckets=4, recognizer_concurrency=2)
    got = docs_table_to_dict(pa.Table.from_pandas(out.to_pandas(), preserve_index=False))
    assert sorted(got) == ["all-boiler", "empty", "only-media", "single", "ws-only"]
    assert got["empty"] == [] and got["all-boiler"] == [] and got["ws-only"] == []
    assert [s["text"] for s in got["single"]] == ["only"]
    assert [s["media_ref"] for s in got["only-media"]] == ["m-1"]


def test_two_phase_degenerate_docs_agree():
    corpus = _corpus([("empty", []), ("one", [_span(text="a")])])
    a = extract_documents(rd.from_arrow(corpus), num_buckets=2, two_phase=False).to_pandas()
    b = extract_documents(rd.from_arrow(corpus), num_buckets=2, two_phase=True, chunk_size=2).to_pandas()
    da = {r["doc_id"]: len(list(r["spans"])) for _, r in a.iterrows()}
    db = {r["doc_id"]: len(list(r["spans"])) for _, r in b.iterrows()}
    assert da == db == {"empty": 0, "one": 1}


# --------------------------------------------------------------------------
# f_fanout — one materialized upstream feeding two consumers (sticky-event
# fan-out): both must observe the identical dataset
# --------------------------------------------------------------------------


def test_fanout_consumers_see_identical_input():
    rows = [
        (f"d-{i:03d}", [_span(text=f"w{i} {j}", offset=j) for j in range(1 + i % 4)])
        for i in range(50)
    ]
    upstream = rd.from_arrow(_corpus(rows)).materialize()  # the sticky event

    extracted = extract_documents(upstream, num_buckets=4, recognizer_concurrency=2)
    from ray.data.aggregate import Sum

    def count_spans(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n": pc.list_value_length(t["spans"]),
            }
        )

    stats = (
        upstream.map_batches(count_spans, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    got = docs_table_to_dict(
        pa.Table.from_pandas(extracted.to_pandas(), preserve_index=False)
    )
    assert set(stats["doc_id"]) == set(got)
    # no boilerplate/glyphs in this corpus -> extraction preserves counts
    for _, r in stats.iterrows():
        assert len(got[r["doc_id"]]) == r["n"]


# --------------------------------------------------------------------------
# f_latch — the count-to-zero barrier: per-doc emitted span count equals
# the per-doc surviving input span count, computed as an independent
# groupby (the latch) over the exploded stream
# --------------------------------------------------------------------------


def test_latch_counts_match_emitted_spans(sf_smoke):
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.sources import read_documents
    from ocr_ray.stages.explode import explode_documents
    from ray.data.aggregate import Count
    import pyarrow.compute as pc

    corpus = ensure_corpus(sf_smoke, glyphs=False)
    ds = read_documents(corpus)
    latch = (
        ds.map_batches(explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False})
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["kind"], "boilerplate")),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .set_index("doc_id")["n"]
    )
    got = docs_table_to_dict(
        pa.Table.from_pandas(
            extract_documents(read_documents(corpus), num_buckets=4).to_pandas(),
            preserve_index=False,
        )
    )
    for doc_id, spans in got.items():
        want = int(latch.get(doc_id, 0))
        assert len(spans) == want, (doc_id, len(spans), want)


# --------------------------------------------------------------------------
# f_schema_fail — malformed inputs rejected loudly (MustFailRun analogue)
# --------------------------------------------------------------------------


def test_schema_fail_missing_column():
    with pytest.raises(SchemaError, match="missing columns"):
        validate_documents_schema(pa.table({"doc_id": pa.array(["a"])}))


def test_schema_fail_wrong_doc_id_type():
    t = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "spans": pa.array([[]], type=pa.large_list(SPAN_STRUCT)),
        }
    )
    with pytest.raises(SchemaError, match="doc_id must be string"):
        validate_documents_schema(t)


def test_schema_fail_bad_span_struct():
    bad_struct = pa.struct([pa.field("kind", pa.string()), pa.field("text", pa.string())])
    t = pa.table(
        {
            "doc_id": pa.array(["a"], type=pa.string()),
            "spans": pa.array([[]], type=pa.large_list(bad_struct)),
        }
    )
    with pytest.raises(SchemaError, match="missing field"):
        validate_documents_schema(t)


def test_schema_fail_exploded_offset_type():
    t = pa.table(
        {
            "doc_id": pa.array(["a"]),
            "kind": pa.array(["text"]),
            "text": pa.array(["w"]),
            "media_ref": pa.array([""]),
            "offset": pa.array([np.int64(0)]),  # must be int32
        }
    )
    with pytest.raises(SchemaError, match="offset"):
        validate_spans_schema(t)


def test_add_chunk_bucket_accepts_integer_doc_ids():
    """The two-phase salt must support int64 doc ids like the single-phase
    doc_bucket path does (raw tables carry integer ids)."""
    import pyarrow as pa

    from ocr_ray.stages.assemble import add_chunk_bucket

    t = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "offset": pa.array([0, 1, 0], pa.int32()),
        }
    )
    out = add_chunk_bucket(t, num_buckets=8, chunk_size=2)
    assert out["bucket"].to_pylist()[0] is not None
    assert set(out.column_names) >= {"chunk_id", "bucket"}


def test_reassemble_bucket_text_tiebreak_is_deterministic():
    """Two spans equal in (doc_id, offset, kind, media_ref) but different
    text must order by text, not by shuffle arrival order."""
    import pyarrow as pa

    from ocr_ray.stages.assemble import reassemble_bucket

    def run(texts):
        t = pa.table(
            {
                "doc_id": pa.array(["d"] * 2),
                "kind": pa.array(["text"] * 2),
                "text": pa.array(texts),
                "media_ref": pa.array([""] * 2),
                "offset": pa.array([0, 0], pa.int32()),
            }
        )
        out = reassemble_bucket(t)
        return [s["text"] for s in out["spans"][0].as_py()]

    assert run(["b", "a"]) == ["a", "b"]
    assert run(["a", "b"]) == ["a", "b"]


def test_empty_group_outputs_carry_full_schema():
    """Zero-row groups must emit the full documents schema (doc_id AND
    spans), never a doc_id-only table."""
    import pyarrow as pa

    from ocr_ray.schema import DOCUMENTS_SCHEMA
    from ocr_ray.stages.assemble import (
        assemble_local,
        merge_chunks_bucket,
        reassemble_bucket,
    )

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.string()),
            "kind": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "media_ref": pa.array([], pa.string()),
            "offset": pa.array([], pa.int32()),
        }
    )
    for fn in (reassemble_bucket, assemble_local, merge_chunks_bucket):
        out = fn(empty.select(["doc_id"]).append_column("spans", pa.array([], pa.large_list(pa.struct([("kind", pa.string())])))) if fn is merge_chunks_bucket else empty)
        assert out.schema.equals(DOCUMENTS_SCHEMA), fn.__name__
