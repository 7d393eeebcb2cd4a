"""End-to-end pipeline vs single-threaded oracle (SURVEY.md §5.1-§5.4).

The correctness contract: span-sequence equality (kind, text, media_ref,
offset) per doc_id, for every fixture profile, under input-order shuffling.
"""

import pyarrow as pa
import pytest

from ocrautomator_ray import synth

from .util import run_and_compare, spans_from_output


@pytest.mark.usefixtures("ray_session")
def test_unit_profile(tmp_path):
    res = run_and_compare(synth.gen_table("unit"), str(tmp_path / "o"))
    c = res["counters"]
    assert c["errors"] == 1          # u-poison
    assert c["dup_rows_dropped"] == 1  # u-dup identical copy
    assert c["pages_ocrd"] >= 1000   # u-fat


@pytest.mark.usefixtures("ray_session")
def test_sf_test_profile(tmp_path):
    t = synth.gen_table("sf-test", rows=300)
    run_and_compare(t, str(tmp_path / "o"))


@pytest.mark.usefixtures("ray_session")
def test_shuffle_invariance(tmp_path):
    """Input row order must not change any output (ordering comes from data)."""
    t = synth.gen_table("sf-test", rows=120)
    perm = list(reversed(range(t.num_rows)))
    shuffled = t.take(pa.array(perm))
    run_and_compare(shuffled, str(tmp_path / "o"))


@pytest.mark.usefixtures("ray_session")
def test_single_partition_and_many_partitions(tmp_path):
    t = synth.gen_table("sf-test", rows=60)
    run_and_compare(t, str(tmp_path / "p1"), num_partitions=1)
    run_and_compare(t, str(tmp_path / "p32"), num_partitions=32)


@pytest.mark.usefixtures("ray_session")
def test_repartition_path(tmp_path):
    t = synth.gen_table("sf-test", rows=60)
    run_and_compare(t, str(tmp_path / "o"), ocr_repartition=8)


@pytest.mark.usefixtures("ray_session")
def test_counters_match_oracle(tmp_path):
    from ocrautomator_ray import oracle

    t = synth.gen_table("sf-test", rows=200)
    res = run_and_compare(t, str(tmp_path / "o"))
    exp = oracle.oracle_table(t).counters
    c = res["counters"]
    assert c["docs"] == exp.docs
    assert c["pages_ocrd"] == exp.pages_ocrd
    assert c["exif_tags_written"] == exp.exif_tags_written
    assert c["errors"] == exp.errors


@pytest.mark.usefixtures("ray_session")
def test_duplicate_doc_ids_with_different_content(tmp_path):
    """Min-dup_key arbitration is deterministic regardless of row order."""
    rows = [
        {"doc_id": "d", "spans": [
            {"kind": "text", "text": "content version alpha", "media_ref": "", "offset": 0}]},
        {"doc_id": "d", "spans": [
            {"kind": "text", "text": "content version beta", "media_ref": "", "offset": 0}]},
    ]
    t = synth.rows_to_table(rows)
    run_and_compare(t, str(tmp_path / "a"))
    t_rev = t.take(pa.array([1, 0]))
    run_and_compare(t_rev, str(tmp_path / "b"))
    assert spans_from_output(str(tmp_path / "a")) == spans_from_output(str(tmp_path / "b"))


@pytest.mark.usefixtures("ray_session")
def test_empty_input_table_is_a_noop(tmp_path):
    import ray.data as rd

    from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction
    from ocrautomator_ray.schema import DOC_SCHEMA

    empty = pa.Table.from_pylist([], schema=DOC_SCHEMA)
    res = run_extraction(
        rd.from_arrow(empty),
        PipelineConfig(out_dir=str(tmp_path / "o"), num_partitions=4, work_factor=0),
    )
    assert res["partitions_this_run"] == 0
    assert res["counters"] == {}


@pytest.mark.usefixtures("ray_session")
def test_psm_override_matches_oracle(tmp_path):
    """Run-level --psm (T2): every page decodes under the forced mode and the
    oracle agrees; output differs from the per-ref-psm run."""
    import ray.data as rd

    from ocrautomator_ray import oracle
    from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction

    from .util import spans_from_output

    t = synth.gen_table("sf-test", rows=40)
    out = str(tmp_path / "o")
    run_extraction(
        rd.from_arrow(t),
        PipelineConfig(out_dir=out, num_partitions=4, work_factor=0, psm_override=11),
    )
    got = spans_from_output(out)
    exp = oracle.oracle_table(t, psm_override=11).spans_by_doc
    assert got == exp
    base = oracle.oracle_table(t).spans_by_doc
    assert got != base  # the override visibly changed segmentation


def test_progress_reporter_tails_manifests(tmp_path):
    """A2: the reporter ingests newly committed part manifests, excludes
    resume-skipped parts from this run's rate, and renders a final line."""
    import io

    from ocrautomator_ray.state.manifest import write_part_manifest
    from ocrautomator_ray.state.progress import ProgressReporter

    out = str(tmp_path / "o")
    write_part_manifest(out, 0, {"part_id": 0, "status": "committed",
                                 "counters": {"docs": 5, "pages_ocrd": 9}})
    buf = io.StringIO()
    rep = ProgressReporter(out, total_parts=4, skip_parts={0},
                           interval=0.05, stream=buf)
    rep.start()
    write_part_manifest(out, 1, {"part_id": 1, "status": "committed",
                                 "counters": {"docs": 7, "pages_ocrd": 11}})
    write_part_manifest(out, 2, {"part_id": 2, "status": "error",
                                 "counters": {"docs": 99}})
    import time

    time.sleep(0.3)
    rep.stop()
    text = buf.getvalue()
    # skip-part 0 counts toward position but not rate; error part ignored
    assert "parts 2/4" in text.splitlines()[-1]
    assert "docs 7" in text.splitlines()[-1]  # extraction-style counters render
    assert rep._counters == {"docs": 7, "pages_ocrd": 11}


def test_jsonl_source_runs_pipeline(tmp_path):
    """S1: a JSONL document table drives the same pipeline as parquet."""
    import ray.data as rd

    from ocrautomator_ray import oracle, synth
    from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction
    from ocrautomator_ray.sources.io import read_docs

    from .util import spans_from_output

    t = synth.gen_table("sf-test", rows=30)
    path = str(tmp_path / "docs.jsonl")
    t.to_pandas().to_json(path, orient="records", lines=True)
    out = str(tmp_path / "o")
    run_extraction(read_docs(path),
                   PipelineConfig(out_dir=out, num_partitions=4, work_factor=0))
    assert spans_from_output(out) == oracle.oracle_table(t).spans_by_doc
