"""Fault tolerance: task retry after worker crash (exactly-once commit) and
kill-then-resume (SURVEY.md §4 Retries / Checkpoint rows)."""

import os

import pytest
import ray.data as rd

from ocrautomator_ray import synth
from ocrautomator_ray.pipelines.extract import PipelineConfig, run_extraction
from ocrautomator_ray.state.manifest import completed_parts, load_manifests

from .util import run_and_compare, spans_from_output

P = 8


def _crash_once_hook(marker_dir: str, pids: frozenset):
    """Kill the worker process the FIRST time each pid in `pids` commits.

    os._exit simulates a machine/worker failure (not a UDF exception), so
    Ray retries the task; the marker file makes the retry succeed.
    """

    def hook(pid: int) -> None:
        if pid in pids:
            marker = os.path.join(marker_dir, f"crashed-{pid}")
            if not os.path.exists(marker):
                open(marker, "w").close()
                os._exit(1)

    return hook


def _always_fail_hook(pids: frozenset):
    def hook(pid: int) -> None:
        if pid in pids:
            raise RuntimeError(f"injected permanent failure for part {pid}")

    return hook


@pytest.mark.usefixtures("ray_session")
def test_worker_crash_is_retried_and_commit_is_exactly_once(tmp_path):
    t = synth.gen_table("sf-test", rows=120)
    marker_dir = str(tmp_path / "markers")
    os.makedirs(marker_dir)
    out = str(tmp_path / "o")
    res = run_and_compare(
        t, out, num_partitions=P,
        extra={"fault_hook": _crash_once_hook(marker_dir, frozenset({1, 3}))},
    )
    # both injected partitions crashed once and then committed on retry
    assert sorted(os.listdir(marker_dir)) == ["crashed-1", "crashed-3"]
    assert res["partitions_committed_total"] == P
    # exactly-once: fresh run (no faults) is identical
    fresh = str(tmp_path / "fresh")
    run_and_compare(t, fresh, num_partitions=P)
    assert spans_from_output(out) == spans_from_output(fresh)


@pytest.mark.usefixtures("ray_session")
def test_permanent_failure_aborts_then_resume_completes(tmp_path):
    t = synth.gen_table("sf-test", rows=120)
    out = str(tmp_path / "o")
    with pytest.raises(Exception):
        run_extraction(
            rd.from_arrow(t),
            PipelineConfig(out_dir=out, num_partitions=P, work_factor=0,
                           extra={"fault_hook": _always_fail_hook(frozenset({2}))}),
        )
    done = completed_parts(out, P)
    assert 2 not in done, "failed partition must not have a committed manifest"
    # no torn output: every manifest present has a valid committed data file
    for pid, m in load_manifests(out).items():
        assert m["status"] == "committed"
    # resume without the fault finishes only the missing partitions and the
    # final table equals a fresh full run
    run_and_compare(t, out, num_partitions=P)
    assert completed_parts(out, P) == set(range(P))
    fresh = str(tmp_path / "fresh")
    run_and_compare(t, fresh, num_partitions=P)
    assert spans_from_output(out) == spans_from_output(fresh)


@pytest.mark.usefixtures("ray_session")
def test_duplicate_commit_guard_fires_demotes_and_resume_recovers(tmp_path):
    """The generic sink's duplicate-part_id guard must FIRE when a partition
    arrives split across exchange blocks (here: the exchange is disabled so
    every input block carries every part_id), back the partitions out by
    demoting their manifests, and a clean rerun must recompute them into a
    correct table — the recovery contract, not just the raise."""
    import pyarrow as pa

    from ocrautomator_ray.pipelines.extract import read_output as sink_read
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    t = pa.table({"doc_id": list(range(100)), "v": list(range(100))})
    halves = rd.from_arrow(t.slice(0, 50)).union(rd.from_arrow(t.slice(50, 50)))
    out = str(tmp_path / "o")

    real_repartition = rd.Dataset.repartition
    rd.Dataset.repartition = lambda self, *a, **k: self  # split every partition
    try:
        with pytest.raises(Exception, match="committed more than once"):
            resumable_write(halves, out, num_partitions=4, key="doc_id")
    finally:
        rd.Dataset.repartition = real_repartition

    # guard backed out: every split partition was demoted, none is trusted
    from ocrautomator_ray.state.manifest import completed_parts
    remaining = completed_parts(out, 4)
    assert remaining != set(range(4))

    # clean rerun recomputes the demoted partitions; table is exactly right
    s = resumable_write(rd.from_arrow(t), out, num_partitions=4, key="doc_id")
    assert completed_parts(out, 4) == set(range(4))
    got = sink_read(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(100))
    assert got["v"].tolist() == list(range(100))


@pytest.mark.usefixtures("ray_session")
def test_minhash_copartition_violation_raises_loudly(tmp_path):
    """minhash verify's co-partitioning invariants must RAISE (never silently
    drop pairs) if the hash exchange ever stops co-locating rows — simulated
    by disabling the exchange, which strands pair end-rows away from their
    shingle rows."""
    from ocrautomator_ray.functions.dedup import minhash_lsh_dups

    real_repartition = rd.Dataset.repartition
    rd.Dataset.repartition = lambda self, *a, **k: self
    try:
        with pytest.raises(Exception, match="co-partitioning violated|committed more than once"):
            minhash_lsh_dups("/root/testdata/sf0.001").to_pandas()
    finally:
        rd.Dataset.repartition = real_repartition
    # and the unbroken pipeline still runs green on the same input
    df = minhash_lsh_dups("/root/testdata/sf0.001").to_pandas()
    assert df.shape[1] == 3


@pytest.mark.usefixtures("ray_session")
def test_driver_sigkill_then_cli_resume_is_exactly_once(tmp_path):
    """The strongest resume claim: SIGKILL the whole DRIVER PROCESS mid-run
    (not a worker crash, not an injected exception) once at least one
    partition has committed, then rerun the CLI on the same out_dir — the
    rerun must recompute only the missing partitions and the final output
    must span-equal the oracle exactly once."""
    import signal
    import subprocess
    import sys
    import time

    import pyarrow.parquet as pq

    from ocrautomator_ray import oracle, synth
    from ocrautomator_ray.state.manifest import completed_parts

    from .util import spans_from_output

    P_KILL = 32  # many small commit waves on 4 CPUs → a real kill window
    t = synth.gen_table("sf-test", seed=23, rows=800)
    inp = str(tmp_path / "in.parquet")
    pq.write_table(t, inp)
    out = str(tmp_path / "o")
    cmd = [sys.executable, "-m", "ocrautomator_ray.run", "--input", inp,
           "--out", out, "--partitions", str(P_KILL), "--num-cpus", "4",
           "--work-factor", "512", "--quiet"]

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            if completed_parts(out, P_KILL) or proc.poll() is not None:
                break
            time.sleep(0.01)  # commits arrive in waves; catch an early one
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    done_after_kill = completed_parts(out, P_KILL)
    if len(done_after_kill) == P_KILL:
        pytest.skip("run finished before the kill landed — nothing to resume")
    assert proc.returncode != 0 or done_after_kill  # it really died mid-run

    r2 = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                        text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert completed_parts(out, P_KILL) == set(range(P_KILL))
    assert spans_from_output(out) == oracle.oracle_table(t).spans_by_doc


def test_driver_sigkill_mid_propagation_resumes_from_checkpoint(tmp_path):
    """VERDICT r3 task #5: the cluster-propagation ITERATION inside
    full_corpus_pipeline must survive a driver SIGKILL — the resumed run
    starts from the last committed round (round-0000's checkpoint is NOT
    re-executed) and the final table equals a cold run's exactly."""
    import signal
    import subprocess
    import sys
    import time

    import duckdb

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "o")
    marker = os.path.join(out, "_cluster_rounds", "round-0000.json")
    cmd = [sys.executable, "-c",
           "import sys; "
           "from ocrautomator_ray.pipelines.full_corpus import run_full_corpus; "
           "run_full_corpus(sys.argv[1], sys.argv[2], num_partitions=8)",
           SF, out]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    # checkpointing is adaptive (commits only slow/convergence rounds);
    # force the every-round path so the drill has a round-0000 marker to
    # kill against at this tiny scale
    env["OCRA_CKPT_MIN_ROUND_SEC"] = "0"

    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if os.path.exists(marker) or proc.poll() is not None:
                break
            time.sleep(0.001)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    if proc.returncode == 0:
        pytest.skip("run finished before the kill landed — nothing to resume")
    assert os.path.exists(marker), "no round committed before the kill"
    r0_mtime = os.stat(marker).st_mtime_ns

    r2 = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                        text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    # the committed round was reused, not re-executed (fewer rounds than cold)
    assert os.stat(marker).st_mtime_ns == r0_mtime

    # resumed output == the one-statement SQL oracle == a cold run
    import __ray_entry__ as e
    from ocrautomator_ray.pipelines.extract import read_output

    got = read_output(out).to_pandas()
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(e.oracle_sql()["full_corpus_pipeline"]).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_bm25_index_build_sigkill_then_resume_is_exact(tmp_path):
    """SIGKILL the driver mid-bm25_index_build once at least one partition
    has committed; the resumed build must recompute only the missing
    partitions and the finished index must answer byte-identically to the
    recompute path."""
    import signal
    import subprocess
    import sys
    import time

    from ocrautomator_ray.state.manifest import completed_parts

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "bm25idx")
    P = 16
    code = (
        "from ocrautomator_ray.functions.corpus import bm25_index_build; "
        f"bm25_index_build({sf!r}, index_dir={idx!r}, num_partitions={P})"
    )
    cmd = [sys.executable, "-c", code]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            if completed_parts(idx, P) or proc.poll() is not None:
                break
            time.sleep(0.01)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    done_after_kill = completed_parts(idx, P)
    if len(done_after_kill) == P:
        pytest.skip("build finished before the kill landed")
    assert proc.returncode != 0 or done_after_kill

    from ocrautomator_ray.functions import corpus as CO

    s = CO.bm25_index_build(sf, index_dir=idx, num_partitions=P)
    assert s["partitions_this_run"] == P - len(done_after_kill)
    assert completed_parts(idx, P) == set(range(P))

    # the resumed index answers byte-identically to the recompute path
    import ray.data as rd

    q = CO._bm25_query_terms(f"{sf}/documents.parquet")
    from ocrautomator_ray.functions.dedup import _fnv1a_strings

    buckets = sorted({int(b) for b in _fnv1a_strings(q) % CO.BM25_BUCKETS})
    frags = CO.bm25_bucket_fragments(idx, buckets)
    N, T = CO._read_bm25_stats(idx)
    import pyarrow.compute as pc_
    import ray as ray_

    q_ref = ray_.put(q)
    tf = rd.read_parquet(frags, columns=["doc_id", "term", "tf", "dl"]) \
        .map_batches(lambda t: t.filter(
            pc_.is_in(t["term"], value_set=ray_.get(q_ref))),
            batch_format="pyarrow", zero_copy_batch=True)
    got = (CO._bm25_rank(tf, N, T, CO.BM25_TOP_K, 4).to_pandas()
           .sort_values("rank").reset_index(drop=True))
    want = (CO.bm25_doc0_topk(sf).to_pandas()
            .sort_values("rank").reset_index(drop=True))
    assert got.equals(want)


_TRAINER_DRILLS = {
    "kmeans": (
        "from ocrautomator_ray.functions.kmeans import kmeans_fit; "
        "kmeans_fit(sys.argv[1], checkpoint_dir=sys.argv[2])"
        ".to_pandas().to_parquet(sys.argv[3])",
        "round-0000.npz",
    ),
    "bpe": (
        "import pyarrow.parquet as pq; "
        "from ocrautomator_ray.functions.corpus import bpe_train_merges; "
        "pq.write_table(bpe_train_merges(sys.argv[1], "
        "checkpoint_dir=sys.argv[2]), sys.argv[3])",
        "round-0000.npz",
    ),
    "perceptron": (
        "from ocrautomator_ray.functions.classifier import perceptron_lang; "
        "perceptron_lang(sys.argv[1], checkpoint_dir=sys.argv[2])"
        ".to_pandas().to_parquet(sys.argv[3])",
        "round-0000.npz",
    ),
    "pagerank": (
        "from ocrautomator_ray.functions.graph import knn_pagerank; "
        "knn_pagerank(sys.argv[1], checkpoint_dir=sys.argv[2])"
        ".to_pandas().to_parquet(sys.argv[3])",
        "round-0000.json",
    ),
}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("family", sorted(_TRAINER_DRILLS))
def test_driver_sigkill_mid_training_resumes_from_round(tmp_path, family):
    """VERDICT r4 #3: every iterative trainer (Lloyd k-means, BPE merges,
    batch perceptron, PageRank) checkpoints its rounds — a driver SIGKILL
    mid-training resumes from the last committed round (round 0's file is
    NOT re-executed) and the resumed output is hash-identical to an
    uncheckpointed cold run."""
    import signal
    import subprocess
    import sys
    import time

    import pandas as pd

    SF = "/root/testdata/sf0.001"
    body, marker_name = _TRAINER_DRILLS[family]
    ckpt = str(tmp_path / "rounds")
    out = str(tmp_path / "out.parquet")
    marker = os.path.join(ckpt, marker_name)
    cmd = [sys.executable, "-c", "import sys; " + body, SF, ckpt, out]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session
    # pagerank rounds are dataset-sized and checkpoint adaptively; force the
    # every-round path so a marker exists to kill against at this scale
    env["OCRA_CKPT_MIN_ROUND_SEC"] = "0"
    # disable the persisted k-means/PQ model so the drill actually trains
    # (a cached model would end the run before the kill window opens)
    env["OCRA_KMEANS_PERSIST"] = "0"

    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if os.path.exists(marker) or proc.poll() is not None:
                break
            time.sleep(0.001)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    if proc.returncode == 0:
        pytest.skip("run finished before the kill landed — nothing to resume")
    assert os.path.exists(marker), "no round committed before the kill"
    r0_mtime = os.stat(marker).st_mtime_ns

    r2 = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                        text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]
    # the committed round was reused, not re-executed
    assert os.stat(marker).st_mtime_ns == r0_mtime

    # resumed output == an uncheckpointed cold run, bit for bit
    from ocrautomator_ray.functions.classifier import perceptron_lang
    from ocrautomator_ray.functions.corpus import bpe_train_merges
    from ocrautomator_ray.functions.graph import knn_pagerank
    from ocrautomator_ray.functions.kmeans import kmeans_fit

    cold = {
        "kmeans": lambda: kmeans_fit(SF).to_pandas(),
        "bpe": lambda: bpe_train_merges(SF).to_pandas(),
        "perceptron": lambda: perceptron_lang(SF).to_pandas(),
        "pagerank": lambda: knn_pagerank(SF).to_pandas(),
    }[family]()
    got = pd.read_parquet(out)
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    cold = cold[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, cold)


@pytest.mark.usefixtures("ray_session")
def test_driver_sigkill_mid_watch_incremental_resumes_without_duplicates(tmp_path):
    """Kill the composed watch-incremental pipeline mid-run (after the
    first epoch's survivors file lands, i.e. between screen and append or
    mid-append): the rerun must complete from the watch manifest, the
    retried append must NOT land a duplicate epoch (survivor fingerprints
    are stable), and the final probe must equal a clean run's exactly."""
    import signal
    import subprocess
    import sys
    import time

    import pandas as pd

    SF = "/root/testdata/sf0.001"
    root = str(tmp_path / "w")
    marker = os.path.join(root, "survivors-000.parquet")
    cmd = [sys.executable, "-c",
           "import sys; "
           "from ocrautomator_ray.pipelines.watch_incremental import "
           "run_watch_incremental; "
           "run_watch_incremental(sys.argv[1], sys.argv[2])",
           SF, root]
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # subprocess owns its own local session

    os.makedirs(root)
    proc = subprocess.Popen(cmd, cwd="/root/repo", env=env,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            if os.path.exists(marker) or proc.poll() is not None:
                break
            time.sleep(0.001)
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    if proc.returncode == 0:
        pytest.skip("run finished before the kill landed — nothing to resume")
    assert os.path.exists(marker), "no epoch started before the kill"

    r2 = subprocess.run(cmd, cwd="/root/repo", env=env, capture_output=True,
                        text=True, timeout=600)
    assert r2.returncode == 0, r2.stderr[-2000:]

    # exactly the two arrival epochs appended, no duplicates from the retry
    epochs_dir = os.path.join(root, "bm25_index", "epochs")
    assert len(os.listdir(epochs_dir)) == 2

    from ocrautomator_ray.pipelines.watch_incremental import (
        query_watch_index,
        run_watch_incremental,
    )

    got = query_watch_index(SF, os.path.join(root, "bm25_index")) \
        .to_pandas().sort_values("rank").reset_index(drop=True)
    clean_root = str(tmp_path / "clean")
    os.makedirs(clean_root)
    res = run_watch_incremental(SF, clean_root)
    want = query_watch_index(SF, res["bm25_index"]) \
        .to_pandas().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
