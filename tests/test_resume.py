"""Checkpoint/resume semantics (SURVEY.md §4, M4).

Resume = O(partitions) manifest pruning. A partially-committed run (some
partitions done) resumed to completion must be byte-equal to a fresh full
run, and already-committed partitions must not be recomputed.
"""

import json
import os

import pytest
import ray.data as rd

from ocrautomator_ray import synth
from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction
from ocrautomator_ray.state import manifest as mf
from ocrautomator_ray.state.manifest import (
    completed_parts,
    load_manifests,
    part_data_path,
    part_manifest_path,
)

from .util import run_and_compare, spans_from_output

P = 8


def _partial_run(t, out_dir, keep_parts):
    """Simulate a killed run: run fully, then delete all but keep_parts."""
    run_extraction(
        rd.from_arrow(t),
        PipelineConfig(out_dir=out_dir, num_partitions=P, work_factor=0),
    )
    for pid in range(P):
        if pid not in keep_parts:
            for path in (part_data_path(out_dir, pid), part_manifest_path(out_dir, pid)):
                if os.path.exists(path):
                    os.remove(path)


@pytest.mark.usefixtures("ray_session")
def test_resume_completes_and_matches_fresh(tmp_path):
    t = synth.gen_table("sf-test", rows=150)
    partial = str(tmp_path / "partial")
    _partial_run(t, partial, keep_parts={0, 1, 2})
    assert completed_parts(partial, P) == {0, 1, 2}

    # resume: prunes committed partitions, completes the rest
    run_and_compare(t, partial, num_partitions=P)
    assert completed_parts(partial, P) == set(range(P))

    fresh = str(tmp_path / "fresh")
    run_and_compare(t, fresh, num_partitions=P)
    assert spans_from_output(partial) == spans_from_output(fresh)


@pytest.mark.usefixtures("ray_session")
def test_resume_skips_committed_partitions(tmp_path):
    t = synth.gen_table("sf-test", rows=100)
    out = str(tmp_path / "o")
    _partial_run(t, out, keep_parts={0, 1})
    # poison the committed manifests' mtimes to detect rewrites
    before = {p: os.stat(part_data_path(out, p)).st_mtime_ns for p in (0, 1)}
    run_extraction(
        rd.from_arrow(t), PipelineConfig(out_dir=out, num_partitions=P, work_factor=0)
    )
    after = {p: os.stat(part_data_path(out, p)).st_mtime_ns for p in (0, 1)}
    assert before == after, "committed partitions were recomputed on resume"


@pytest.mark.usefixtures("ray_session")
def test_mismatched_partitioning_not_resumed(tmp_path):
    t = synth.gen_table("sf-test", rows=50)
    out = str(tmp_path / "o")
    run_extraction(rd.from_arrow(t), PipelineConfig(out_dir=out, num_partitions=4, work_factor=0))
    # a manifest written under P=4 must not satisfy a P=8 resume scan
    assert completed_parts(out, 8) == set()
    assert completed_parts(out, 4) == set(range(4))


@pytest.mark.usefixtures("ray_session")
def test_out_dir_partitioning_mismatch_fails_fast(tmp_path):
    """Reusing an out_dir with a different num_partitions must refuse loudly
    (stale part-NNNNN manifests/fragments would silently mix into reads);
    same-P reuse stays a valid full-resume noop."""
    t = synth.gen_table("sf-test", rows=50)
    out = str(tmp_path / "o")
    run_extraction(rd.from_arrow(t),
                   PipelineConfig(out_dir=out, num_partitions=4, work_factor=0))
    with pytest.raises(RuntimeError, match="num_partitions"):
        run_extraction(rd.from_arrow(t),
                       PipelineConfig(out_dir=out, num_partitions=8, work_factor=0))
    s = run_extraction(rd.from_arrow(t),
                       PipelineConfig(out_dir=out, num_partitions=4, work_factor=0))
    assert s["partitions_this_run"] == 0  # unchanged state, clean resume


@pytest.mark.usefixtures("ray_session")
def test_demoted_part_is_recomputed_on_resume(tmp_path):
    """demote_part removes only the manifest; resume recomputes exactly the
    demoted partition (the recovery path for a backed-out bad commit)."""
    t = synth.gen_table("sf-test", rows=80)
    out = str(tmp_path / "o")
    run_extraction(rd.from_arrow(t),
                   PipelineConfig(out_dir=out, num_partitions=P, work_factor=0))
    mf.demote_part(out, 2)
    assert completed_parts(out, P) == set(range(P)) - {2}
    s = run_extraction(rd.from_arrow(t),
                       PipelineConfig(out_dir=out, num_partitions=P, work_factor=0))
    assert s["partitions_this_run"] == 1
    assert completed_parts(out, P) == set(range(P))


@pytest.mark.usefixtures("ray_session")
def test_manifest_lineage_and_counters(tmp_path):
    t = synth.gen_table("sf-test", rows=80)
    out = str(tmp_path / "o")
    run_extraction(
        rd.from_arrow(t),
        PipelineConfig(out_dir=out, num_partitions=4, work_factor=0, input_desc="unit-test-input"),
    )
    ms = load_manifests(out)
    assert set(ms) == set(range(4))
    for pid, m in ms.items():
        assert m["status"] == "committed"
        lin = m["lineage"]
        assert lin["num_partitions"] == 4 and lin["part_id"] == pid
        assert lin["input"] == "unit-test-input"
        assert os.path.exists(os.path.join(out, lin["output_fragment"]))
        assert {"docs", "pages_ocrd", "exif_tags_written", "errors", "retries"} <= set(m["counters"])


def test_manifest_atomic_write(tmp_path):
    out = str(tmp_path)
    mf.write_part_manifest(out, 3, {"part_id": 3, "status": "committed"})
    path = part_manifest_path(out, 3)
    assert os.path.exists(path)
    assert not [f for f in os.listdir(os.path.dirname(path)) if ".tmp." in f]
    assert json.load(open(path))["part_id"] == 3


@pytest.mark.usefixtures("ray_session")
def test_fully_resumed_run_is_a_noop(tmp_path):
    """Re-running a completed job must short-circuit, not crash on an empty
    exchange (regression: empty schemaless block hit the hash aggregator)."""
    t = synth.gen_table("sf-test", rows=60)
    out = str(tmp_path / "o")
    first = run_extraction(
        rd.from_arrow(t), PipelineConfig(out_dir=out, num_partitions=4, work_factor=0)
    )
    assert first["partitions_this_run"] == 4
    again = run_extraction(
        rd.from_arrow(t), PipelineConfig(out_dir=out, num_partitions=4, work_factor=0)
    )
    assert again["partitions_this_run"] == 0
    assert again["partitions_committed_total"] == 4
    assert again["counters"] == first["counters"]


@pytest.mark.usefixtures("ray_session")
def test_read_output_ignores_torn_tmp_files(tmp_path):
    """A task killed mid-write leaves a partial tmp file; reads must follow
    the manifests, never the directory listing."""
    from ocrautomator_ray.pipelines.extract import read_output
    from ocrautomator_ray.state.manifest import data_dir

    t = synth.gen_table("sf-test", rows=40)
    out = str(tmp_path / "o")
    run_extraction(rd.from_arrow(t), PipelineConfig(out_dir=out, num_partitions=4, work_factor=0))
    with open(os.path.join(data_dir(out), "part-00001.parquet.tmp.999"), "wb") as f:
        f.write(b"torn partial parquet garbage")
    ds = read_output(out)
    assert ds.count() == 40  # junk ignored; committed fragments only
