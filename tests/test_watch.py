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
    assert man["epochs"][1]["fragments"] == [
        os.path.join(input_dir, "part-2.parquet")
    ]


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


def test_list_fragments_filters_and_sorts(tmp_path):
    d = str(tmp_path)
    for name in ["b.parquet", "a.parquet", "x.txt", ".hidden.parquet"]:
        open(os.path.join(d, name), "w").close()
    got = list_fragments(d)
    assert [os.path.basename(p) for p in got] == ["a.parquet", "b.parquet"]
