"""The resumable training-set artifact (pipelines/training.py): content
parity with the oracle-checked registry entry, idempotent re-run, and
fragment-level resume after a simulated partial failure."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pandas as pd
import pytest

from ocr_ray.pipelines.training import read_training_set, write_training_set

OUT = "/tmp/ocr_ray_test_training_set"


@pytest.fixture(scope="module")
def artifact(sf_smoke):
    shutil.rmtree(OUT, ignore_errors=True)
    manifest = write_training_set(sf_smoke, OUT, num_parts=4)
    return manifest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = ["doc_id", "win_start", "n_tokens", "split"]
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def test_artifact_matches_registry_rows(artifact, sf_smoke):
    from ocr_ray.pipelines.queries import QUERY_FNS

    expected = _canon(QUERY_FNS["extract_training_set"](sf_smoke).to_pandas())
    on_disk = read_training_set(OUT).to_pandas()
    assert int(artifact["row_count"].sum()) == len(expected)
    pd.testing.assert_frame_equal(_canon(on_disk), expected)
    # the artifact also carries the window text the oracle row drops
    nonempty = on_disk[on_disk["n_tokens"] > 0]
    assert (nonempty["chunk"].str.count(" ") + 1 == nonempty["n_tokens"]).all()


def test_rerun_writes_nothing(artifact, sf_smoke):
    again = write_training_set(sf_smoke, OUT, num_parts=4)
    assert len(again) == 0


def test_resume_rewrites_only_missing_fragment(artifact, sf_smoke):
    # simulate a partial failure: drop one committed fragment + its record
    victim_dir = sorted(Path(OUT).glob("split=train/part=*"))[0]
    part = int(victim_dir.name.split("=")[1])
    rec_path = Path(OUT) / "split=train" / "_manifest" / f"part-{part:05d}.json"
    victim_rows = json.loads(rec_path.read_text())["row_count"]
    shutil.rmtree(victim_dir)
    rec_path.unlink()

    resumed = write_training_set(sf_smoke, OUT, num_parts=4)
    assert set(zip(resumed["split"], resumed["partition"])) == {("train", part)}
    assert int(resumed["row_count"].sum()) == victim_rows

    from ocr_ray.pipelines.queries import QUERY_FNS

    expected = _canon(QUERY_FNS["extract_training_set"](sf_smoke).to_pandas())
    pd.testing.assert_frame_equal(_canon(read_training_set(OUT).to_pandas()), expected)
