"""Query registry section: media (split from the former monolithic queries.py)."""

from __future__ import annotations


import pyarrow.compute as pc
import ray
import ray.data

from ocr_ray.corpus import ensure_corpus
from ocr_ray.sizing import pool_size
from ocr_ray.sources import read_documents

from ocr_ray.pipelines.queries._shared import query


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stubbed; schema/actor/batch layout real)
# ---------------------------------------------------------------------------


_MEDIA_SQL = """
WITH src AS (SELECT doc_id AS d, string_split(text, ' ') AS ws FROM documents),
w AS (SELECT d, generate_subscripts(ws, 1) AS i FROM src),
spans AS (SELECT d, (i - 1) // 8 AS si FROM w GROUP BY d, (i - 1) // 8),
media AS (
  SELECT d, si, (d * 1000 + si) % 9973 AS m FROM spans
  WHERE (d + si) % 7 <> 0 AND (d + si) % 5 = 3
),
b AS (SELECT unnest(generate_series(0, 255)) AS i),
bytes AS (
  SELECT d, si, m, i % 8 AS lane, (m * 37 + 11 + i * 7) % 256 AS val
  FROM media CROSS JOIN b
),
feat AS (
  SELECT d, si, m, lane, CAST(SUM(val) AS DOUBLE) / (32 * 255.0) AS f
  FROM bytes GROUP BY d, si, m, lane
),
piv AS (
  SELECT d, si, m,
    MAX(CASE WHEN lane = 0 THEN f END) AS f0,
    MAX(CASE WHEN lane = 1 THEN f END) AS f1,
    MAX(CASE WHEN lane = 2 THEN f END) AS f2,
    MAX(CASE WHEN lane = 3 THEN f END) AS f3,
    MAX(CASE WHEN lane = 4 THEN f END) AS f4,
    MAX(CASE WHEN lane = 5 THEN f END) AS f5,
    MAX(CASE WHEN lane = 6 THEN f END) AS f6,
    MAX(CASE WHEN lane = 7 THEN f END) AS f7
  FROM feat GROUP BY d, si, m
)
SELECT printf('doc-%08d', d) AS doc_id, printf('m-%d', m) AS media_ref,
  'image' AS media_kind, CAST(256 AS BIGINT) AS n_bytes,
  f0, f1, f2, f3, f4, f5, f6, f7,
  sqrt(f0*f0 + f1*f1 + f2*f2 + f3*f3 + f4*f4 + f5*f5 + f6*f6 + f7*f7) AS feature_norm
FROM piv
"""


@query("media_features", sql=_MEDIA_SQL)
def media_features(sf_dir: str) -> ray.data.Dataset:
    """Media spans -> synthetic binary payloads -> MediaDecoder actor pool
    (small batches for wide binary rows) -> per-item feature rows.

    The payload rule is integer arithmetic on the media_ref suffix, so the
    whole binary path (payload synthesis -> buffer-level vectorized decode
    -> per-lane byte moments) is reproduced by the SQL oracle bit for bit;
    the list-typed ``feature`` column is dropped here in favor of the f0..f7
    scalars (same values) because list columns don't hash stably across
    engines."""
    from ocr_ray.stages.explode import explode_documents
    from ocr_ray.stages.media import MEDIA_FEATURE_DIM, MediaDecoder, attach_payloads

    corpus = ensure_corpus(sf_dir, glyphs=False)
    ds = read_documents(corpus)
    flat = ds.map_batches(
        explode_documents, batch_format="pyarrow", fn_kwargs={"sentinels": False}
    ).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    with_payloads = flat.map_batches(attach_payloads, batch_format="pyarrow", batch_size=512)
    decoded = with_payloads.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=pool_size(),
        fn_constructor_kwargs={"fake_decode": True},
    )
    cols = ["doc_id", "media_ref", "media_kind", "n_bytes"] + [
        f"f{j}" for j in range(MEDIA_FEATURE_DIM)
    ] + ["feature_norm"]
    return decoded.map_batches(lambda t: t.select(cols), batch_format="pyarrow")

