"""Curation pipeline + generic resumable sink: end-to-end equality with the
SQL oracle is covered by test_queries (curate_pipeline); these pin the sink's
commit/resume contract."""

import duckdb
import pandas as pd
import pytest

from ocrautomator_ray.pipelines.curate import run_curation
from ocrautomator_ray.pipelines.extract import read_output
from ocrautomator_ray.state.manifest import demote_part

SF = "/root/testdata/sf0.001"


def _read(out_dir) -> pd.DataFrame:
    return (read_output(str(out_dir)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_curation_sink_commit_resume_cycle(tmp_path):
    out = str(tmp_path / "o")
    s1 = run_curation(SF, out, num_partitions=8)
    assert s1["partitions_this_run"] == 8
    assert s1["partitions_committed_total"] == 8
    first = _read(out)
    assert s1["counters"]["rows"] == len(first) > 0

    # full resume is a noop and output is unchanged
    s2 = run_curation(SF, out, num_partitions=8)
    assert s2["partitions_this_run"] == 0
    pd.testing.assert_frame_equal(_read(out), first)

    # a demoted (lost) partition is recomputed exactly, nothing else
    demote_part(out, 3)
    s3 = run_curation(SF, out, num_partitions=8)
    assert s3["partitions_this_run"] == 1
    pd.testing.assert_frame_equal(_read(out), first)


@pytest.mark.usefixtures("ray_session")
def test_sink_hive_partition_by(tmp_path):
    """partition_by=<col> writes data/<col>=<val>/part-*.parquet: the full
    manifest-driven read is unchanged, a selective read of one value dir
    returns exactly that slice, and resume stays partition-scoped."""
    import glob
    import os

    import ray.data as rd

    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    out = str(tmp_path / "o")
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "n_chars"])
    s1 = resumable_write(docs, out, num_partitions=4, key="doc_id",
                         partition_by="lang")
    assert s1["partitions_this_run"] == 4
    full = _read(out)
    ref = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "lang", "n_chars"]) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(full[ref.columns], ref)

    # hive layout on disk + selective single-value read
    langs = sorted(ref["lang"].unique())
    dirs = sorted(os.path.basename(d)
                  for d in glob.glob(os.path.join(out, "data", "lang=*")))
    assert dirs == [f"lang={v}" for v in langs]
    one = rd.read_parquet(os.path.join(out, "data", f"lang={langs[0]}")) \
        .to_pandas()
    assert set(one["lang"]) == {langs[0]}
    assert len(one) == (ref["lang"] == langs[0]).sum()

    # resume is still a partition-scoped noop
    s2 = resumable_write(docs, out, num_partitions=4, key="doc_id",
                         partition_by="lang")
    assert s2["partitions_this_run"] == 0
    pd.testing.assert_frame_equal(_read(out), full)


@pytest.mark.usefixtures("ray_session")
def test_sink_hive_hostile_values_and_nulls(tmp_path):
    """Partition values with path separators are %-escaped; null values land
    in the hive default partition; no row is lost; a different partition_by
    on the same out_dir is refused."""
    import glob
    import os

    import pyarrow as pa
    import ray.data as rd

    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    out = str(tmp_path / "o")
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "lang": pa.array(["pt/BR", "a=b", None, ".."], pa.string()),
    })
    s = resumable_write(rd.from_arrow(t), out, num_partitions=2,
                        key="doc_id", partition_by="lang")
    assert s["counters"]["rows"] == 4
    got = _read(out)
    assert sorted(got["doc_id"]) == [1, 2, 3, 4]      # nothing lost
    dirs = {os.path.basename(d)
            for d in glob.glob(os.path.join(out, "data", "lang=*"))}
    assert dirs == {"lang=pt%2FBR", "lang=a%3Db", "lang=%2E%2E",
                    "lang=__HIVE_DEFAULT_PARTITION__"} or (
        # '.' is safe under quote(); the essential property is that no dir
        # escapes data/ and separators are escaped
        all("/" not in d.replace("lang=", "", 1) for d in dirs)
        and "lang=__HIVE_DEFAULT_PARTITION__" in dirs
        and len(dirs) == 4
    )
    # every fragment lives under data/
    for d in glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True):
        assert os.path.commonpath([d, os.path.join(out, "data")]) == \
            os.path.join(out, "data")

    with pytest.raises(RuntimeError, match="partition_by"):
        resumable_write(rd.from_arrow(t), out, num_partitions=2,
                        key="doc_id", partition_by=None)


@pytest.mark.usefixtures("ray_session")
def test_sink_refuses_mismatched_partitioning(tmp_path):
    out = str(tmp_path / "o")
    run_curation(SF, out, num_partitions=4)
    with pytest.raises(RuntimeError, match="num_partitions"):
        run_curation(SF, out, num_partitions=8)


@pytest.mark.usefixtures("ray_session")
def test_curated_rows_pass_their_own_filters(tmp_path):
    out = str(tmp_path / "o")
    run_curation(SF, out, num_partitions=4)
    df = _read(out)
    assert (df["n_words"] >= 5).all()
    assert (df["dup_word_frac_u"] <= 300_000).all()
    assert df["norm_text"].is_unique
    assert set(df["split"]) <= {"train", "val", "test"}
    # keep-first: every kept doc_id is the min over its norm_text group
    con = duckdb.connect()
    base = con.execute(f"""
        SELECT regexp_replace(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                              '^ | $', '', 'g') AS nt, MIN(doc_id) AS mn
        FROM read_parquet('{SF}/documents.parquet') GROUP BY nt
    """).df().set_index("nt")["mn"]
    assert all(base[nt] == did for nt, did in zip(df["norm_text"], df["doc_id"]))
