"""End-to-end extraction correctness vs the pure-Python oracle.

The invariant (BASELINE.json input_hint): span-sequence equality
(kind, text, media_ref, order) per doc_id.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_ray.corpus import ensure_corpus
from ocr_ray.oracle import expected_extraction
from ocr_ray.pipelines.extract import extract_documents
from ocr_ray.schema import (
    docs_table_to_dict,
    span_sequences_equal,
    validate_documents_schema,
)
from ocr_ray.sources import read_documents


def _run_extraction(sf_dir: str, *, glyphs: bool) -> dict[str, list[dict]]:
    corpus = ensure_corpus(sf_dir, glyphs=glyphs)
    ds = read_documents(corpus)
    out = extract_documents(ds, num_buckets=8, recognizer_concurrency=2)
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    got = docs_table_to_dict(
        pa.table(
            {
                "doc_id": tbl["doc_id"].cast(pa.string()),
                "spans": tbl["spans"],
            }
        )
    )
    return got


@pytest.mark.parametrize("glyphs", [False, True], ids=["plain", "glyphs"])
def test_extraction_matches_oracle(sf_smoke, glyphs):
    got = _run_extraction(sf_smoke, glyphs=glyphs)
    want = expected_extraction(sf_smoke)
    assert set(got) == set(want), (
        f"doc universe mismatch: missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}"
    )
    bad = []
    for doc_id, spans in want.items():
        if not span_sequences_equal(got[doc_id], spans):
            bad.append((doc_id, got[doc_id][:3], spans[:3]))
    assert not bad, f"{len(bad)} docs mismatch; first: {bad[0]}"


def test_offsets_reindexed(sf_smoke):
    got = _run_extraction(sf_smoke, glyphs=False)
    for doc_id, spans in got.items():
        offs = [s["offset"] for s in spans]
        assert offs == list(range(len(spans))), (doc_id, offs[:10])


def test_corpus_schema_valid(sf_smoke):
    import pyarrow.parquet as pq
    from pathlib import Path

    corpus = ensure_corpus(sf_smoke, glyphs=False)
    files = sorted(Path(corpus).glob("*.parquet"))
    assert files
    validate_documents_schema(pq.read_table(files[0]))
