"""Watch mode (incremental micro-batch ingestion): each round processes only
new input fragments; the epoch union equals the oracle over everything seen;
crashes mid-epoch resume; idle rounds are no-ops."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocrautomator_ray import oracle, synth
from ocrautomator_ray.pipelines.watch import (
    list_fragments,
    read_watch_output,
    run_watch,
)

CFG = dict(num_partitions=4, work_factor=0)


def _write_fragment(input_dir: str, name: str, table: pa.Table) -> None:
    os.makedirs(input_dir, exist_ok=True)
    pq.write_table(table, os.path.join(input_dir, name))


def _spans(out_dir):
    got = {}
    for row in read_watch_output(out_dir).take_all():
        got[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        ]
    return got


def _expected(*tables):
    exp = {}
    for t in tables:
        exp.update(oracle.oracle_table(t).spans_by_doc)
    return exp


@pytest.mark.usefixtures("ray_session")
def test_watch_processes_only_new_fragments(tmp_path):
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    full = synth.gen_table("sf-test", seed=7, rows=40)
    a, b, c = full.slice(0, 15), full.slice(15, 15), full.slice(30, 10)
    _write_fragment(input_dir, "part-0.parquet", a)
    _write_fragment(input_dir, "part-1.parquet", b)

    r1 = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r1["epochs_run"] == 1 and r1["total_epochs"] == 1
    assert _spans(out_dir) == _expected(a, b)

    # idle round: nothing new → no epoch
    r_idle = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r_idle["epochs_run"] == 0 and r_idle["total_epochs"] == 1

    # a new fragment arrives → exactly one more epoch, over ONLY the new docs
    _write_fragment(input_dir, "part-2.parquet", c)
    r2 = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r2["epochs_run"] == 1 and r2["total_epochs"] == 2
    assert r2["docs"] == c.num_rows
    assert _spans(out_dir) == _expected(a, b, c)

    # the second epoch's data holds only the new docs
    with open(os.path.join(out_dir, "watch_manifest.json")) as f:
        man = json.load(f)
    assert [e["status"] for e in man["epochs"]] == ["committed", "committed"]
    assert [f["path"] for f in man["epochs"][1]["fragments"]] == [
        os.path.join(input_dir, "part-2.parquet")
    ]
    # fragment identity is (path, size, mtime_ns) — stats recorded for every
    # fragment so later mutation is detectable
    for ep in man["epochs"]:
        for f in ep["fragments"]:
            assert f["size"] == os.path.getsize(f["path"])


@pytest.mark.usefixtures("ray_session")
def test_watch_pending_epoch_resumes_after_crash(tmp_path):
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    full = synth.gen_table("sf-test", seed=9, rows=30)
    a, b = full.slice(0, 20), full.slice(20, 10)
    _write_fragment(input_dir, "part-0.parquet", a)
    run_watch(input_dir, out_dir, rounds=1, **CFG)

    # simulate a crash AFTER the pending record was written but BEFORE the
    # epoch pipeline ran: a pending entry with fragments and no epoch dir
    _write_fragment(input_dir, "part-1.parquet", b)
    path = os.path.join(out_dir, "watch_manifest.json")
    with open(path) as f:
        man = json.load(f)
    man["epochs"].append({
        "epoch": 1,
        "fragments": [os.path.join(input_dir, "part-1.parquet")],
        "status": "pending",
    })
    with open(path, "w") as f:
        json.dump(man, f)

    r = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r["epochs_run"] == 1
    assert _spans(out_dir) == _expected(a, b)
    with open(path) as f:
        man = json.load(f)
    assert all(e["status"] == "committed" for e in man["epochs"])


@pytest.mark.usefixtures("ray_session")
def test_watch_mixed_format_round(tmp_path):
    """One round may pick up parquet AND jsonl fragments — each family gets
    its own reader (a single wrong reader would wedge the pending epoch)."""
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    full = synth.gen_table("sf-test", seed=11, rows=24)
    a, b = full.slice(0, 12), full.slice(12, 12)
    _write_fragment(input_dir, "part-0.parquet", a)
    b.to_pandas().to_json(os.path.join(input_dir, "part-1.jsonl"),
                          orient="records", lines=True)
    r = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r["epochs_run"] == 1 and r["docs"] == 24
    assert _spans(out_dir) == _expected(a, b)


@pytest.mark.usefixtures("ray_session")
def test_watch_kill_mid_epoch_resumes_exactly_once(tmp_path):
    """End-to-end mid-epoch death: the epoch pipeline aborts after SOME
    partitions committed (injected permanent failure on one partition); the
    next watch round replays the pending epoch, the epoch's partition resume
    recomputes ONLY the missing partitions, and the union equals the oracle
    exactly once."""
    from ocrautomator_ray.state.manifest import completed_parts

    from .test_faults import _always_fail_hook

    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    full = synth.gen_table("sf-test", seed=13, rows=40)
    a, b = full.slice(0, 20), full.slice(20, 20)
    _write_fragment(input_dir, "part-0.parquet", a)
    run_watch(input_dir, out_dir, rounds=1, **CFG)

    _write_fragment(input_dir, "part-1.parquet", b)
    with pytest.raises(Exception):
        run_watch(input_dir, out_dir, rounds=1,
                  extra={"fault_hook": _always_fail_hook(frozenset({2}))},
                  **CFG)
    man = json.load(open(os.path.join(out_dir, "watch_manifest.json")))
    assert [e["status"] for e in man["epochs"]] == ["committed", "pending"]
    epoch_dir = os.path.join(out_dir, "epoch-00001")
    done_before = completed_parts(epoch_dir, CFG["num_partitions"])
    assert 2 not in done_before
    mtimes_before = {
        pid: os.path.getmtime(os.path.join(epoch_dir, "data", f"part-{pid:05d}.parquet"))
        for pid in done_before
    }

    r = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r["epochs_run"] == 1
    man = json.load(open(os.path.join(out_dir, "watch_manifest.json")))
    assert all(e["status"] == "committed" for e in man["epochs"])
    assert _spans(out_dir) == _expected(a, b)  # exactly-once union
    # partitions that committed before the death were NOT recomputed
    for pid, mt in mtimes_before.items():
        assert os.path.getmtime(
            os.path.join(epoch_dir, "data", f"part-{pid:05d}.parquet")) == mt


@pytest.mark.usefixtures("ray_session")
def test_watch_detects_mutation_and_vanished_pending(tmp_path):
    """A committed fragment mutated afterwards warns (and is not re-ingested);
    a pending epoch whose fragment vanished fails with a clear error."""
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    full = synth.gen_table("sf-test", seed=17, rows=20)
    a, b = full.slice(0, 10), full.slice(10, 10)
    _write_fragment(input_dir, "part-0.parquet", a)
    run_watch(input_dir, out_dir, rounds=1, **CFG)

    # mutate the committed fragment: next round warns, ingests nothing new
    _write_fragment(input_dir, "part-0.parquet", b)  # overwrite
    os.utime(os.path.join(input_dir, "part-0.parquet"), ns=(1, 1))
    with pytest.warns(UserWarning, match="NOT re-ingested"):
        r = run_watch(input_dir, out_dir, rounds=1, **CFG)
    assert r["epochs_run"] == 0
    assert _spans(out_dir) == _expected(a)

    # pending epoch over a vanished fragment: clear error, names the file
    path = os.path.join(out_dir, "watch_manifest.json")
    man = json.load(open(path))
    gone = os.path.join(input_dir, "gone.parquet")
    man["epochs"].append({"epoch": 1, "status": "pending", "fragments": [
        {"path": gone, "size": 1, "mtime_ns": 1}]})
    json.dump(man, open(path, "w"))
    with pytest.raises(RuntimeError, match="vanished|changed"):
        run_watch(input_dir, out_dir, rounds=1, **CFG)


def test_list_fragments_filters_and_sorts(tmp_path):
    d = str(tmp_path)
    for name in ["b.parquet", "a.parquet", "x.txt", ".hidden.parquet"]:
        open(os.path.join(d, name), "w").close()
    got = list_fragments(d)
    assert [os.path.basename(p) for p in got] == ["a.parquet", "b.parquet"]


@pytest.mark.usefixtures("ray_session")
def test_watch_incremental_pipeline_resumes_and_matches_fresh(tmp_path):
    """The composed incremental pipeline (arrivals → near-dup screen vs the
    committed signature index → BM25 epoch appends): a rerun over the same
    out_root must re-ingest NO epochs (watch-manifest resume) and the probe
    answer must equal the fresh run's exactly."""
    import pandas as pd

    from ocrautomator_ray.pipelines.watch_incremental import (
        query_watch_index,
        run_watch_incremental,
    )

    SF = "/root/testdata/sf0.001"
    root = str(tmp_path / "w")
    os.makedirs(root)
    res1 = run_watch_incremental(SF, root)
    assert len(res1["epochs"]) == 2
    assert all(e["kept"] + e["dropped"] >= e["kept"] for e in res1["epochs"])
    a = query_watch_index(SF, res1["bm25_index"]).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    assert len(a) > 0

    res2 = run_watch_incremental(SF, root)
    assert res2["epochs"] == []  # all epochs committed — nothing re-ingested
    b = query_watch_index(SF, res2["bm25_index"]).to_pandas() \
        .sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
