"""Registry + config-driven builder: spec-built pipelines must equal the
directly-composed pipeline (span-sequence equality), unknown stages must
fail loudly before execution, and the CLI driver must run + resume."""

from __future__ import annotations

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from ocr_ray.corpus import ensure_corpus
from ocr_ray.pipelines.builder import build_pipeline, run_pipeline
from ocr_ray.pipelines.extract import extract_documents
from ocr_ray.registry import UnknownStageError, list_stages, stage
from ocr_ray.schema import docs_table_to_dict, span_sequences_equal
from ocr_ray.sources import read_documents


def _spec(corpus: str, *, sink: dict | None = None, stages: list | None = None) -> dict:
    return {
        "pipeline": {
            "source": {"path": corpus},
            "stages": stages
            or [
                {"name": "explode"},
                {"name": "normalize"},
                {"name": "recognize", "concurrency": [1, 2], "batch_size": 4096},
                {"name": "strip_boilerplate"},
                {"name": "reassemble", "num_buckets": 8},
            ],
            **({"sink": sink} if sink else {}),
        }
    }


def test_builder_matches_direct_pipeline(sf_smoke):
    corpus = ensure_corpus(sf_smoke, glyphs=True)
    built = pa.concat_tables(
        build_pipeline(_spec(corpus)).iter_batches(batch_format="pyarrow")
    )
    direct = pa.concat_tables(
        extract_documents(
            read_documents(corpus), num_buckets=8, recognizer_concurrency=2
        ).iter_batches(batch_format="pyarrow")
    )
    a, b = docs_table_to_dict(built), docs_table_to_dict(direct)
    assert set(a) == set(b)
    assert all(span_sequences_equal(a[d], b[d]) for d in a)


def test_unknown_stage_fails_before_execution(sf_smoke):
    corpus = ensure_corpus(sf_smoke, glyphs=True)
    with pytest.raises(UnknownStageError):
        build_pipeline(_spec(corpus, stages=[{"name": "expload"}]))


def test_registry_lists_builtins():
    names = set(list_stages())
    assert {"explode", "normalize", "recognize", "strip_boilerplate", "reassemble"} <= names


def test_user_stage_registration(sf_smoke):
    corpus = ensure_corpus(sf_smoke, glyphs=True)

    @stage("keep_media_only")
    def keep_media_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch["kind"], "media"))

    ds = build_pipeline(
        _spec(
            corpus,
            stages=[{"name": "explode", "sentinels": False}, {"name": "keep_media_only"}],
        )
    )
    kinds = set(ds.unique("kind"))
    assert kinds == {"media"}


def test_cli_run_and_resume(sf_smoke, tmp_path):
    corpus = ensure_corpus(sf_smoke, glyphs=True)
    out = str(tmp_path / "out")
    cfg = tmp_path / "pipeline.json"
    cfg.write_text(
        json.dumps(_spec(corpus, sink={"out_dir": out, "num_parts": 4, "resume": True}))
    )
    run = subprocess.run(
        [sys.executable, "-m", "ocr_ray.run", "--config", str(cfg), "--num-cpus", "2"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert run.returncode == 0, run.stderr[-2000:]
    s1 = json.loads(run.stdout.strip().splitlines()[-1])
    assert s1["fragments_written"] == 4 and s1["fragments_skipped"] == 0
    assert s1["rows_written"] > 0
    # per-stage execution metrics land next to the lineage (BASELINE.md §4)
    stats_txt = (tmp_path / "out" / "_metrics" / "stage_stats.txt").read_text()
    assert "MapBatches" in stats_txt or "Operator" in stats_txt

    rerun = subprocess.run(
        [sys.executable, "-m", "ocr_ray.run", "--config", str(cfg), "--num-cpus", "2"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert rerun.returncode == 0, rerun.stderr[-2000:]
    s2 = json.loads(rerun.stdout.strip().splitlines()[-1])
    assert s2["fragments_skipped"] == 4 and s2["rows_written"] == 0


def test_builder_curation_spec_matches_kernels(sf_smoke):
    """The shipped curation spec (configs/curate_sf001.yaml shape) over the
    FLAT documents table must equal composing the kernels directly."""
    import pyarrow.parquet as pq

    from ocr_ray.functions.text import pii_augment, pii_redact

    spec = {
        "pipeline": {
            "source": {
                "path": f"{sf_smoke}/documents.parquet",
                "columns": ["doc_id", "text"],
            },
            "stages": [{"name": "pii_augment"}, {"name": "pii_redact"}],
        }
    }
    built = (
        pa.concat_tables(build_pipeline(spec).iter_batches(batch_format="pyarrow"))
        .sort_by("doc_id")
    )
    src = pq.read_table(f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"])
    direct = pii_redact(pii_augment(src)).sort_by("doc_id")
    assert built.equals(direct)


def test_run_pipeline_resume_guards(tmp_path, ray_session):
    """The sink-spec layout record makes two silent-corruption paths loud:
    resuming with a CHANGED stage list, and resuming a pipeline whose
    stages mint new doc ids (the partition filter reasons about source
    ids only)."""
    import pytest as _pytest

    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.pipelines.builder import run_pipeline

    corpus = ensure_corpus("/root/testdata/sf0.001", glyphs=False)
    out = str(tmp_path / "guard")
    spec = {
        "pipeline": {
            "source": {"path": corpus},
            "stages": [{"name": "explode"}, {"name": "normalize"}],
            "sink": {"out_dir": out, "num_parts": 4},
        }
    }
    s1 = run_pipeline(spec)
    assert s1["fragments_written"] == 4

    changed = {
        "pipeline": {
            **spec["pipeline"],
            "stages": [{"name": "explode"}, {"name": "normalize"}, {"name": "strip_boilerplate"}],
        }
    }
    with _pytest.raises(ValueError, match="spec_sha"):
        run_pipeline(changed)

    minting = {
        "pipeline": {
            **spec["pipeline"],
            "stages": [{"name": "with_mutants"}, {"name": "explode"}],
        }
    }
    with _pytest.raises(ValueError, match="id-creating stage"):
        run_pipeline(minting)

    # unchanged spec resumes as a clean no-op
    s2 = run_pipeline(spec)
    assert s2["fragments_written"] == 0 and s2["fragments_skipped"] == 4


def test_normalize_spec_rejects_non_mapping():
    import pytest as _pytest

    from ocr_ray.pipelines.builder import _normalize_spec

    with _pytest.raises(ValueError, match="mapping"):
        _normalize_spec(None)
    with _pytest.raises(ValueError, match="mapping"):
        _normalize_spec({"pipeline": None})


def test_weblayout_stages_compose_via_spec(sf_smoke, ray_session):
    """The web/layout legs are first-class registry stages: a YAML-shaped
    spec (attach_span_warc -> extract_warc_spans) must reproduce the
    direct query pipeline's span rows exactly."""
    import pandas as pd

    corpus = ensure_corpus(sf_smoke, glyphs=False)
    spec = _spec(
        corpus,
        stages=[
            {"name": "attach_span_warc", "batch_size": 64},
            {"name": "extract_warc_spans", "concurrency": 2, "batch_size": 4},
        ],
    )
    built = build_pipeline(spec).to_pandas()
    from ocr_ray.stages.warc import WarcSpanExtractor, attach_span_warc_payloads

    direct = (
        read_documents(corpus)
        .map_batches(attach_span_warc_payloads, batch_format="pyarrow", batch_size=64)
        .map_batches(
            WarcSpanExtractor, batch_format="pyarrow", batch_size=4, concurrency=2
        )
        .to_pandas()
    )
    cols = ["doc_id", "offset", "kind", "text", "media_ref"]
    a = built[cols].sort_values(["doc_id", "offset"]).reset_index(drop=True)
    b = direct[cols].sort_values(["doc_id", "offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
