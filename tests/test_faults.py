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
