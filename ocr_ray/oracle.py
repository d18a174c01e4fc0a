"""Pure-Python test oracle for the extraction pipeline.

Computes, with no Ray and no Arrow kernels, the expected extracted span
sequence per document — the golden the engine must match under
span-sequence equality ``(kind, text, media_ref, order)`` per ``doc_id``
(FIXTURES.md "Expected-output schema"). Mirrors the reference's
scalar-golden test style (e.g. smith-waterman's printed ``score:``,
``/root/reference/examples/smith-waterman/smithwaterman.c:188``) but per
row instead of per run.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from ocr_ray.corpus import WORDS_PER_SPAN, doc_id_str, span_kind
from ocr_ray.schema import KIND_BOILERPLATE, KIND_MEDIA, KIND_TEXT
from ocr_ray.corpus import MEDIA_MOD


def expected_doc(d: int, text: str) -> list[dict]:
    """Expected extracted spans of one document, in final (re-indexed) order.

    Boilerplate spans dropped; glyph spans recognized back to their source
    text (the oracle knows it — the codec is deterministic and the
    recognizer must invert it exactly); offsets re-indexed 0..k-1.
    """
    words = text.split(" ")
    out: list[dict] = []
    for si in range(0, (len(words) + WORDS_PER_SPAN - 1) // WORDS_PER_SPAN):
        kind = span_kind(d, si)
        if kind == KIND_BOILERPLATE:
            continue
        if kind == KIND_MEDIA:
            out.append(
                {
                    "kind": KIND_MEDIA,
                    "text": "",
                    "media_ref": "m-%d" % ((d * 1000 + si) % MEDIA_MOD),
                    "offset": len(out),
                }
            )
        else:
            s = " ".join(words[si * WORDS_PER_SPAN : (si + 1) * WORDS_PER_SPAN])
            # glyph spans recognize back to text — same expected row either way
            out.append({"kind": KIND_TEXT, "text": s, "media_ref": "", "offset": len(out)})
    return out


def expected_extraction(sf_dir: str) -> dict[str, list[dict]]:
    """{doc_id_str: expected spans} for every document in an sf dir."""
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {
        doc_id_str(int(d)): expected_doc(int(d), t)
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    }
