"""Set-logic pins for the composed embedding-curation pipeline
(pipelines/embedding_curation.py). The SQL end-to-end mirror is the primary
gate; this checks the composition invariants the hash can't localize."""

import pytest

from ocrautomator_ray.functions.ann import embedding_outliers, semantic_dedup
from ocrautomator_ray.functions.kmeans import CLUSTER_CAP, cluster_sample
from ocrautomator_ray.pipelines.embedding_curation import (
    run_embedding_curation_flagship,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def curated():
    return run_embedding_curation_flagship(SF).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_curated_excludes_both_drop_sets(curated):
    sem = semantic_dedup(SF).to_pandas()
    dropped = set(sem.loc[sem["kept"] == 0, "vec_id"])
    out = set(embedding_outliers(SF).to_pandas()["vec_id"])
    got = set(curated["vec_id"])
    assert not (got & dropped)
    assert not (got & out)
    assert len(got) == len(curated)          # no duplicate rows


@pytest.mark.usefixtures("ray_session")
def test_curated_respects_cluster_cap(curated):
    sizes = curated.groupby("cluster")["vec_id"].size()
    assert (sizes <= CLUSTER_CAP).all()
    assert len(sizes) > 1                     # multiple modes survive


@pytest.mark.usefixtures("ray_session")
def test_curation_is_cluster_sample_restricted_to_survivors(curated):
    # dropping nothing would reproduce cluster_sample; with drops, every
    # curated pick must also be the cap-selection among survivors — i.e.
    # a member of cluster_sample's pick OR ranked in after a dropped pick
    cs = cluster_sample(SF).to_pandas()
    # sanity: same cluster ids for the vec_ids both selected
    merged = curated.merge(cs, on="vec_id", suffixes=("_cur", "_full"))
    assert (merged["cluster_cur"] == merged["cluster_full"]).all()


@pytest.mark.usefixtures("ray_session")
def test_curation_sink_resumes_as_noop(tmp_path):
    from ocrautomator_ray.pipelines.embedding_curation import (
        run_embedding_curation,
    )

    out = str(tmp_path / "curated")
    first = run_embedding_curation(SF, out, num_partitions=4)
    again = run_embedding_curation(SF, out, num_partitions=4)
    assert first["partitions_this_run"] > 0
    assert again["partitions_this_run"] == 0      # full resume = noop
    assert again["counters"]["rows"] == first["counters"]["rows"] == 200
