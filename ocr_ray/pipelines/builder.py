"""Config-driven pipeline builder — the machine-description analogue.

The reference constructs its entire runtime object graph from an INI file
(two passes: types -> factories, instances -> wiring;
``/root/reference/src/driver/ocr-driver.c:97-191``,
``ocr-machine-description.c:463-684``). This engine's equivalent is a
YAML/JSON pipeline spec interpreted over the stage registry:

.. code-block:: yaml

    pipeline:
      source:
        path: /tmp/ocr_ray_corpus/sf0.001-glyphs-x1   # parquet dir / lance
        columns: [doc_id, spans]
      stages:
        - name: explode
        - name: normalize
        - name: recognize          # stateful -> actor pool
          concurrency: [1, 8]
          batch_size: 8192
        - name: strip_boilerplate
        - name: reassemble_two_phase
          num_buckets: 64
      sink:
        out_dir: /tmp/ocr_ray_out
        num_parts: 32
        resume: true               # skip fragments already in the manifest

Engine knobs (``batch_size``, ``concurrency``, ``num_cpus``) live next to
the stage that owns them — the INI "instance" parameters. Unknown stage
names raise ``UnknownStageError`` before any execution starts.
"""

from __future__ import annotations

from typing import Any

import ray.data

from ocr_ray.registry import apply_stage, get_stage
from ocr_ray.sources import read_documents


def _normalize_spec(spec: dict[str, Any]) -> dict[str, Any]:
    if not isinstance(spec, dict):
        raise ValueError(f"pipeline spec must be a mapping, got {type(spec).__name__}")
    spec = spec.get("pipeline", spec)
    if not isinstance(spec, dict):
        raise ValueError("'pipeline' key must hold a mapping")
    for key in ("source", "stages"):
        if key not in spec:
            raise ValueError(f"pipeline spec missing {key!r}")
    return spec


def load_spec(path: str) -> dict[str, Any]:
    """Load a YAML or JSON pipeline spec file."""
    import json

    text = open(path).read()
    if path.endswith(".json"):
        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


def build_pipeline(spec: dict[str, Any]) -> ray.data.Dataset:
    """Spec -> lazy Dataset (no execution). Validates every stage name
    up front; stage kwargs are applied as overrides on registry defaults."""
    spec = _normalize_spec(spec)
    stages = [dict(s) for s in spec["stages"]]
    for s in stages:
        get_stage(s["name"])  # fail fast on unknown names / typos
    src = spec["source"]
    ds = read_documents(src["path"], columns=src.get("columns"))
    for s in stages:
        name = s.pop("name")
        ds = apply_stage(ds, name, **s)
    return ds


def run_pipeline(spec: dict[str, Any]) -> dict[str, Any]:
    """Build + execute a spec end-to-end, with resumable sink and metrics.

    Returns a run summary (fragment counts, skip counts, wall time). The
    sink writes per-partition lineage records (see ``ocr_ray.state``);
    per-stage ``ds.stats()`` is dumped under ``<out_dir>/_metrics/``.
    """
    import json
    import time
    from pathlib import Path

    from ocr_ray.state.manifest import (
        skip_completed_partitions,
        write_extracted_resumable,
    )

    spec = _normalize_spec(spec)
    sink = spec.get("sink")
    t0 = time.perf_counter()
    if sink is None:
        ds = build_pipeline(spec)
        n = ds.count()
        return {"rows": int(n), "wall_sec": round(time.perf_counter() - t0, 3)}

    out_dir = sink["out_dir"]
    num_parts = int(sink.get("num_parts", 16))
    skipped = 0
    src = spec["source"]
    stages = [dict(s) for s in spec["stages"]]
    for s in stages:
        get_stage(s["name"])  # fail fast on unknown names / typos
    # resume-safety: the partition filter reasons about SOURCE doc ids, so a
    # stage that mints new ids could re-emit rows into already-committed
    # fragments and clobber them — refuse instead of silently losing data
    if sink.get("resume", True) and any(
        get_stage(s["name"]).creates_ids for s in stages
    ):
        raise ValueError(
            "resume=true with an id-creating stage "
            f"({[s['name'] for s in stages if get_stage(s['name']).creates_ids]}): "
            "the partition filter cannot prove committed fragments are "
            "complete. Set sink.resume: false or use a fresh out_dir."
        )
    # the layout record also pins the SPEC: resuming a directory written by
    # a different stage list would silently mix two pipelines' outputs
    import hashlib

    spec_sha = hashlib.sha256(
        json.dumps({"source": src, "stages": stages}, sort_keys=True).encode()
    ).hexdigest()
    ds = read_documents(src["path"], columns=src.get("columns"))
    if sink.get("resume", True):
        ds, skipped = skip_completed_partitions(
            ds, out_dir, num_parts, extra_layout={"spec_sha": spec_sha}
        )
    for s in stages:
        s = dict(s)
        name = s.pop("name")
        ds = apply_stage(ds, name, **s)
    manifest, stage_stats = write_extracted_resumable(
        ds, out_dir, num_parts=num_parts, return_stats=True
    )
    wall = time.perf_counter() - t0

    mdir = Path(out_dir) / "_metrics"
    mdir.mkdir(parents=True, exist_ok=True)
    # per-stage execution metrics next to the lineage (BASELINE.md protocol
    # step 4) — wall time / CPU / rows / memory per operator of this run.
    (mdir / "stage_stats.txt").write_text(stage_stats)
    summary = {
        "rows_written": int(manifest["row_count"].sum()) if len(manifest) else 0,
        "spans_written": int(manifest["span_count"].sum()) if len(manifest) else 0,
        "fragments_written": int(len(manifest)),
        "fragments_skipped": int(skipped),
        "num_parts": num_parts,
        "wall_sec": round(wall, 3),
    }
    (mdir / "run_summary.json").write_text(json.dumps(summary, indent=2))
    return summary
