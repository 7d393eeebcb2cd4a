"""Restartability of the training-mix pipeline product path: both halves —
the checkpointed picked mix (gram screen + budget exchange) and the
range-partitioned sink — must resume without recomputation, and a destroyed
sink must rebuild bit-identically from the checkpoint alone."""

import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _read(out_dir):
    from ocrautomator_ray.pipelines.extract import read_output

    df = read_output(out_dir).to_pandas()
    return df.sort_values(["pos"]).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_training_mix_sink_and_checkpoint_resume(tmp_path):
    from ocrautomator_ray.pipelines.training_mix import (
        build_training_mix,
        run_training_mix,
    )

    out = str(tmp_path / "mix")
    s1 = run_training_mix(SF, out, num_partitions=4)
    assert s1["partitions_this_run"] == 4
    t1 = _read(out)
    # the sink output equals the lazy queries() surface
    ref = build_training_mix(SF).to_pandas().sort_values(
        ["pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(t1, ref[t1.columns.tolist()])
    # positions are dense 0..n-1 and part files shard them contiguously
    assert t1["pos"].tolist() == list(range(len(t1)))

    marker = os.path.join(out, "_picked", "mix.json")
    mt0 = os.stat(marker).st_mtime_ns

    # full resume: nothing recomputed in either half
    s2 = run_training_mix(SF, out, num_partitions=4)
    assert s2["partitions_this_run"] == 0
    assert os.stat(marker).st_mtime_ns == mt0

    # kill-drill: destroy the sink's data + manifests, keep the checkpoint —
    # the rerun must rebuild the exact table WITHOUT re-running the screen
    shutil.rmtree(os.path.join(out, "data"))
    shutil.rmtree(os.path.join(out, "manifest"))
    s3 = run_training_mix(SF, out, num_partitions=4)
    assert s3["partitions_this_run"] == 4
    assert os.stat(marker).st_mtime_ns == mt0  # picked mix NOT recomputed
    pd.testing.assert_frame_equal(_read(out), t1)

    # a different budget invalidates the checkpoint (input fingerprint)
    run_training_mix(SF, out + "2", num_partitions=4, budget=123)
    m2 = os.path.join(out + "2", "_picked", "mix.json")
    s4 = run_training_mix(SF, out + "2", num_partitions=4, budget=456)
    assert s4["partitions_this_run"] == 4
    import json

    assert json.load(open(m2))["budget"] == 456
