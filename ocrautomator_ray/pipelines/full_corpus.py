"""Full end-to-end corpus pipeline — the composition a training-data team
actually runs, as ONE hash-checked artifact:

    read documents → MinHash near-dup REMOVAL (verified pairs → connected
                     components → drop non-canonical members via a
                     large×large left-anti join; exact duplicates are a
                     special case, jaccard 1.0)
                   → normalize + quality filter + exact dedup + split
                     (the curation chain, fed the survivors)
                   → resumable partitioned-parquet sink

Every stage is the already-verified building block (minhash_dup_clusters,
neardup_removed_docs' anti-join shape, pipelines/curate.py), chained lazily
so the whole thing streams: the only materialization barriers are the ones
the components themselves own (the cluster-propagation rounds' node-sized
adjacency pins). The SQL oracle is the composition of the same components'
mirrors — one statement, hash-exact.
"""

from __future__ import annotations

import ray.data as rd

from ocrautomator_ray.pipelines.curate import (
    CURATED_SCHEMA,
    CURATE_SQL_FINAL,
    build_curated,
    curate_sql_ctes,
)


def build_full_corpus(sf_dir: str,
                      cluster_checkpoint_dir: str | None = None) -> rd.Dataset:
    """Lazy chain: near-dup removal → curation. Output columns:
    (doc_id, norm_text, n_words, dup_word_frac_u, split).

    ``cluster_checkpoint_dir`` makes the EAGER part of the chain — the
    cluster-propagation rounds inside minhash_dup_clusters — restartable:
    without it a driver death mid-propagation restarts the iteration from
    round 0 even though the sink downstream resumes."""
    import pyarrow.compute as pc

    from ocrautomator_ray.functions.dedup import minhash_dup_clusters
    from ocrautomator_ray.functions.exchange import (
        auto_partitions,
        pruned_read,
        tune_exchange,
    )

    drop = minhash_dup_clusters(
        sf_dir, checkpoint_dir=cluster_checkpoint_dir,
    ).map_batches(
        lambda t: t.filter(
            pc.not_equal(t["doc_id"], t["cluster_id"])
        ).select(["doc_id"]).rename_columns(["drop_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    docs = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    n_parts = auto_partitions(f"{sf_dir}/documents.parquet")
    tune_exchange(docs, n_parts)
    kept = docs.join(drop, join_type="left_anti", num_partitions=n_parts,
                     on=("doc_id",), right_on=("drop_id",))
    return build_curated(sf_dir, source=kept)


def _full_corpus_sql() -> str:
    from ocrautomator_ray.functions.dedup import MINHASH_THRESHOLD, _minhash_ctes

    return f"""
WITH RECURSIVE {_minhash_ctes()},
dup AS MATERIALIZED (
    SELECT doc_a, doc_b FROM ver
    WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {MINHASH_THRESHOLD}
),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM dup
    UNION
    SELECT doc_b, doc_a FROM dup
),
reach(u, v) AS (
    SELECT u, v FROM edges
    UNION
    SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
),
comp AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u),
dropped AS (SELECT doc_id FROM comp WHERE doc_id <> cluster_id),
kept AS (
    SELECT dd.doc_id, dd.text
    FROM documents dd LEFT JOIN dropped USING (doc_id)
    WHERE dropped.doc_id IS NULL
),
{curate_sql_ctes("kept")}
{CURATE_SQL_FINAL}
"""


SQL_FULL_CORPUS = _full_corpus_sql()


def run_full_corpus(sf_dir: str, out_dir: str, num_partitions: int = 16,
                    resume: bool = True,
                    partition_by: str | None = None) -> dict:
    """Execute the full pipeline into the resumable sink (pass
    ``partition_by="split"`` for hive train/val/test directories). The
    cluster-propagation rounds checkpoint under the sink's out_dir, so a
    killed run resumes BOTH halves: the iteration from its last committed
    round and the sink from its committed partitions."""
    import os

    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    ckpt = os.path.join(out_dir, "_cluster_rounds") if resume else None
    return resumable_write(build_full_corpus(sf_dir,
                                             cluster_checkpoint_dir=ckpt),
                           out_dir,
                           num_partitions=num_partitions, key="doc_id",
                           input_desc=f"{sf_dir}/documents.parquet",
                           resume=resume, partition_by=partition_by)


def run_full_corpus_flagship(sf_dir: str,
                             scratch_root: str = "/tmp/ocrautomator_ray",
                             fresh: bool = True) -> rd.Dataset:
    """queries() surface: run the whole chain through the sink and return
    the committed table (manifest-driven read)."""
    import hashlib
    import os
    import shutil

    from ocrautomator_ray.pipelines.extract import read_output

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    out_dir = os.path.join(scratch_root, f"fullcorpus-{tag}")
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    run_full_corpus(sf_dir, out_dir)
    return read_output(out_dir, empty_schema=CURATED_SCHEMA)
