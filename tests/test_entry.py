"""Driver-contract smoke: entry() and the flagship pipeline query."""

import pytest


@pytest.mark.usefixtures("ray_session")
def test_entry_runs_and_has_stable_schema():
    import __ray_entry__ as e

    ds = e.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert list(sorted(df.columns)) == ["doc_id", "kind", "media_ref", "offset", "text"]
    assert df.shape[0] > 0
    assert set(df["kind"].unique()) <= {"text", "exif"}
    # flagship spans are contiguous per doc
    g = df.sort_values(["doc_id", "offset"]).groupby("doc_id")["offset"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()


@pytest.mark.usefixtures("ray_session")
def test_flagship_spans_match_oracle():
    """The streaming-synthesized flagship (read_driver_docs → extraction)
    produces exactly the oracle's span sequences for every document."""
    import __ray_entry__ as e
    from ocrautomator_ray import oracle, synth

    df = e.entry().to_pandas()
    exp = oracle.oracle_table(
        synth.docs_from_documents_parquet("/root/testdata/sf0.001"))
    got = {
        did: list(g[["kind", "text", "media_ref", "offset"]]
                  .sort_values("offset").itertuples(index=False, name=None))
        for did, g in df.groupby("doc_id")
    }
    exp_nonempty = {d: s for d, s in exp.spans_by_doc.items() if s}
    assert got == exp_nonempty


@pytest.mark.usefixtures("ray_session")
def test_entry_is_deterministic_across_runs():
    import __ray_entry__ as e

    a = e.entry().to_pandas().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    b = e.entry().to_pandas().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    assert a.equals(b)
