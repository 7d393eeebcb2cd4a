"""CLI dispatch smoke for the corpus pipelines: `--pipeline full-corpus` and
`--pipeline training-mix` must run end-to-end in a fresh process (workers
import by cwd), commit partitions, and be a no-op on immediate rerun (the
whole-product resume contract, both checkpoint halves included)."""

import json
import os
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.001"


def _run_cli(pipeline: str, out: str) -> None:
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    cmd = [sys.executable, "-m", "ocrautomator_ray.run", "--pipeline",
           pipeline, "--input", SF, "--out", out, "--partitions", "4",
           "--num-cpus", "4", "--quiet"]
    r = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.parametrize("pipeline", ["full-corpus", "training-mix"])
def test_cli_pipeline_runs_and_rerun_resumes(pipeline, tmp_path):
    out = str(tmp_path / pipeline)
    _run_cli(pipeline, out)
    parts = sorted(os.listdir(os.path.join(out, "data")))
    assert parts, "no committed fragments"
    manifests = [f for f in os.listdir(os.path.join(out, "manifest"))
                 if f.startswith("part-") and f.endswith(".json")]
    assert len(manifests) == 4
    stamp = {f: os.stat(os.path.join(out, "data", f)).st_mtime_ns
             for f in parts}
    with open(os.path.join(out, "manifest", manifests[0])) as f:
        assert json.load(f).get("status") == "committed"

    # rerun = full resume: no fragment rewritten
    _run_cli(pipeline, out)
    for f, m in stamp.items():
        assert os.stat(os.path.join(out, "data", f)).st_mtime_ns == m, f


def test_cli_watch_incremental_runs_and_rerun_resumes(tmp_path):
    """`--pipeline watch-incremental` end-to-end in a fresh process: both
    arrival epochs ingested into the BM25 index, and an immediate rerun
    re-ingests nothing (the watch-manifest resume)."""
    out = str(tmp_path / "wi")
    os.makedirs(out)
    _run_cli("watch-incremental", out)
    epochs = os.path.join(out, "bm25_index", "epochs")
    assert len(os.listdir(epochs)) == 2
    with open(os.path.join(out, "watch", "watch_manifest.json")) as f:
        m = json.load(f)
    assert [ep["status"] for ep in m["epochs"]] == ["committed", "committed"]
    stamps = {e: os.stat(os.path.join(epochs, e)).st_mtime_ns
              for e in os.listdir(epochs)}
    _run_cli("watch-incremental", out)
    assert {e: os.stat(os.path.join(epochs, e)).st_mtime_ns
            for e in os.listdir(epochs)} == stamps
