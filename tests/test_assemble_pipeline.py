"""Assembly pipeline (cap → mix → dense shuffle → sink): end-to-end SQL
equality is covered by the driver check (assemble_pipeline); these pin the
dense-position invariants and the sink resume contract."""

import numpy as np
import pandas as pd
import pytest

from ocrautomator_ray.pipelines.assemble import run_assembly
from ocrautomator_ray.pipelines.extract import read_output
from ocrautomator_ray.state.manifest import demote_part

SF = "/root/testdata/sf0.001"


def _read(out_dir) -> pd.DataFrame:
    return (read_output(str(out_dir)).to_pandas()
            .sort_values("pos").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_assembly_positions_and_resume(tmp_path):
    out = str(tmp_path / "o")
    s1 = run_assembly(SF, out, num_partitions=8)
    assert s1["partitions_this_run"] == 8
    df = _read(out)
    # pos is a dense 0..n-1 permutation of the replica stream
    assert (df["pos"].to_numpy() == np.arange(len(df))).all()
    # every (doc_id, epoch) replica is unique; epochs dense per doc
    assert not df.duplicated(["doc_id", "epoch"]).any()
    g = df.groupby("doc_id")["epoch"]
    assert (g.min() == 0).all()
    assert (g.max() == g.size() - 1).all()
    # cap respected on distinct docs per source
    per_src = df.drop_duplicates("doc_id").groupby("source").size()
    from ocrautomator_ray.functions.mix import SOURCE_CAP
    assert (per_src <= SOURCE_CAP).all()

    # range partitioning: part-i holds the i-th contiguous pos range, rows
    # sorted within — the committed layout is globally ordered by file order
    import glob

    import pyarrow.parquet as pq

    prev_hi = -1
    for f in sorted(glob.glob(f"{out}/data/part-*.parquet")):
        pos = pq.read_table(f, columns=["pos"])["pos"].to_numpy()
        assert (np.diff(pos) > 0).all(), f"{f} not sorted within"
        assert pos[0] == prev_hi + 1, f"{f} not contiguous with previous part"
        prev_hi = int(pos[-1])
    assert prev_hi == len(df) - 1

    # full resume is a noop; a demoted partition recomputes identically
    s2 = run_assembly(SF, out, num_partitions=8)
    assert s2["partitions_this_run"] == 0
    demote_part(out, 5)
    s3 = run_assembly(SF, out, num_partitions=8)
    assert s3["partitions_this_run"] == 1
    pd.testing.assert_frame_equal(_read(out), df)
