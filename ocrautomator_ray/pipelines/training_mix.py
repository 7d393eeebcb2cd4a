"""Training-mix assembly pipeline — the round-4 composition, ONE
hash-checked artifact chaining the new corpus-curation operators:

    read documents → boilerplate screen (drop docs whose duplicated-8-gram
                     share exceeds 30%, the detection half of Lee et al.'s
                     exact substring dedup)
                   → per-source TOKEN budget fill in seeded-shuffle order
                     (how a pretraining mix is specified: tokens, not docs)
                   → dense global shuffle positions over the picked mix

Every stage is an already-verified building block (dup_ngram_stats'
gram exchange, apply_token_budget's two-phase prefix sum, seeded_shuffle's
bucket-histogram ranking); the SQL oracle is the composition of the same
components' mirrors in one statement.

Scale shape: the gram exchange and the budget exchange move (gram, doc, k)
and (doc_id, source, h, n_tok) rows respectively — never text; the ONLY
materialization is the PICKED mix (int columns, bounded by the token
budget × sources by construction), pinned so the position histogram and the
ranking exchange don't re-execute the gram screen. Driver state is
O(sources × buckets) offsets + O(buckets) position offsets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.dedup import _ramp
from ocrautomator_ray.functions.exchange import (
    auto_partitions,
    per_key_blocks,
    tune_exchange,
)
from ocrautomator_ray.functions.lm import NGRAM_N, dup_ngram_stats
from ocrautomator_ray.functions.mix import (
    SHUFFLE_BUCKETS,
    SHUFFLE_SEED,
    TOKEN_BUDGET,
    apply_token_budget,
    keyed_token_docs,
    sql_mix_hash,
)

BOILER_NUM = 3   # drop when n_dup_grams * 10 > n_grams * 3  (share > 30%)
BOILER_DEN = 10

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("source", pa.string()),
    ("n_tokens", pa.int64()), ("pos", pa.int64()),
])


def _picked_mix(sf_dir: str, budget: int = TOKEN_BUDGET) -> rd.Dataset:
    """The screened, budget-filled mix (doc_id, source, h, bucket, n_tok),
    materialized — the expensive eager half of the pipeline (gram screen +
    budget exchange), split out so ``run_training_mix`` can checkpoint it."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"
    n_parts = auto_partitions(path)

    def to_drops(t: pa.Table) -> pa.Table:
        bad = pc.greater(pc.multiply(t["n_dup_grams"], BOILER_DEN),
                         pc.multiply(t["n_grams"], BOILER_NUM))
        return pa.table({"drop_id": t.filter(bad)["doc_id"]})

    # Pin the drop list (one int column, screened-out docs only — the same
    # nodes-sized class as the cluster-propagation adjacency pins): the
    # budget machinery consumes its input twice (sums pass + exchange), and
    # without the pin each pass would re-run the whole gram screen.
    drops = dup_ngram_stats(sf_dir).map_batches(
        to_drops, batch_format="pyarrow", zero_copy_batch=True).materialize()

    keyed = keyed_token_docs(path)
    tune_exchange(keyed, n_parts)
    surv = keyed.join(drops, join_type="left_anti", num_partitions=n_parts,
                      on=("doc_id",), right_on=("drop_id",))

    # The picked mix is budget-bounded by construction (≤ budget tokens per
    # source) and carries int/tag columns only — the one materialization,
    # so the position histogram and ranking don't re-run the gram screen.
    return apply_token_budget(surv, budget).materialize()


def _rank_picked(picked: rd.Dataset) -> tuple[rd.Dataset, int]:
    """Dense shuffle positions over the picked mix; returns (dataset, total
    rows) so a range-partitioned sink can shard contiguously by ``pos``."""
    hist = (picked.select_columns(["bucket"])
            .groupby("bucket", num_partitions=8).count().to_pandas())
    offsets = np.zeros(SHUFFLE_BUCKETS + 1, np.int64)
    np.add.at(offsets, hist["bucket"].to_numpy() + 1,
              hist["count()"].to_numpy())
    offsets = np.cumsum(offsets)

    def rank_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        h = block["h"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, b))
        b_sorted = b[order]
        starts = np.flatnonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])
        run_len = np.diff(np.r_[starts, len(b_sorted)])
        pos = offsets[b_sorted] + _ramp(run_len)
        take = pa.array(order)
        return pa.table({
            "doc_id": block["doc_id"].take(take),
            "source": block["source"].take(take),
            "n_tokens": block["n_tok"].take(take),
            "pos": pa.array(pos, pa.int64()),
        })

    ranked = per_key_blocks(picked, ["bucket"], rank_block,
                            num_partitions=min(16, SHUFFLE_BUCKETS))
    return ranked, int(offsets[-1])


def build_training_mix(sf_dir: str,
                       budget: int = TOKEN_BUDGET) -> rd.Dataset:
    """(doc_id, source, n_tokens, pos): the assembled mix — boilerplate
    screened, budget-filled per source, densely shuffle-positioned.  Docs
    with fewer than {NGRAM_N} tokens have no gram rows and pass the screen
    (nothing to judge), matching the oracle's LEFT JOIN."""
    ranked, _ = _rank_picked(_picked_mix(sf_dir, budget))
    return ranked


def run_training_mix(sf_dir: str, out_dir: str, num_partitions: int = 16,
                     resume: bool = True,
                     budget: int = TOKEN_BUDGET) -> dict:
    """Execute the pipeline into the range-partitioned ordered sink (the
    assemble-pipeline layout: part-i holds the i-th contiguous ``pos`` range,
    rows sorted within — what a sequential training reader consumes).

    Restartable in BOTH halves, like run_full_corpus: the picked mix (the
    product of the gram screen + budget exchange, budget-bounded ints) is
    checkpointed under ``out_dir/_picked`` with an atomic tmpdir→rename
    commit keyed by an input fingerprint (documents file identity + budget —
    the dedup-round checkpoint discipline), so a killed run re-reads it
    instead of re-running the screen; the sink below resumes its committed
    partitions as everywhere else."""
    import json
    import os
    import shutil

    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    ckpt = os.path.join(out_dir, "_picked")
    data_dir = os.path.join(ckpt, "mix")
    marker = os.path.join(ckpt, "mix.json")
    st = os.stat(f"{sf_dir}/documents.parquet")
    fp = {"input": f"{sf_dir}/documents.parquet", "size": st.st_size,
          "mtime_ns": st.st_mtime_ns, "budget": budget}

    committed = False
    if resume and os.path.exists(marker) and os.path.isdir(data_dir):
        try:
            with open(marker) as f:
                committed = json.load(f) == fp
        except (OSError, json.JSONDecodeError):
            committed = False
    if committed:
        picked = rd.read_parquet(data_dir)
    else:
        # The sink commits only AFTER the checkpoint marker exists, so any
        # sink state found alongside a missing/mismatched marker was written
        # for a DIFFERENT input or budget — wipe it rather than let resume
        # serve stale committed partitions (the run-manifest guard checks
        # partitioning, not input rows).
        for sub in ("data", "manifest"):
            shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        os.makedirs(ckpt, exist_ok=True)
        tmp = data_dir + ".tmpdir"
        shutil.rmtree(tmp, ignore_errors=True)
        _picked_mix(sf_dir, budget).write_parquet(tmp)
        os.replace(tmp, data_dir)
        mt = marker + ".tmp"
        with open(mt, "w") as f:
            json.dump(fp, f)
        os.rename(mt, marker)  # marker LAST: kill between the two re-runs
        picked = rd.read_parquet(data_dir)

    ranked, total = _rank_picked(picked)
    return resumable_write(ranked, out_dir, num_partitions=num_partitions,
                           input_desc=f"{sf_dir}/documents.parquet",
                           resume=resume, range_bound=max(total, 1),
                           sort_within="pos")


def run_training_mix_flagship(sf_dir: str) -> rd.Dataset:
    """queries() surface."""
    return build_training_mix(sf_dir)


SQL_TRAINING_MIX = rf"""
WITH d AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS tl
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(tl[p + 1 : p + {NGRAM_N}], ' ') AS gram
  FROM d, LATERAL (SELECT unnest(range(0, greatest(len(tl) - {NGRAM_N - 1},
                                                   0))) AS p) u
),
gd AS (SELECT doc_id, gram, COUNT(*) AS k FROM grams GROUP BY doc_id, gram),
cg AS (SELECT gram, CAST(SUM(k) AS BIGINT) AS cg FROM gd GROUP BY gram),
gstat AS (
  SELECT doc_id, SUM(k) AS n_grams,
         SUM(CASE WHEN cg > 1 THEN k ELSE 0 END) AS n_dup
  FROM gd JOIN cg USING (gram) GROUP BY doc_id
),
surv AS (
  SELECT d.doc_id, d.source, CAST(len(d.tl) AS BIGINT) AS n_tokens,
         {sql_mix_hash('d.doc_id', SHUFFLE_SEED)} AS h
  FROM d LEFT JOIN gstat USING (doc_id)
  WHERE gstat.doc_id IS NULL
     OR gstat.n_dup * {BOILER_DEN} <= gstat.n_grams * {BOILER_NUM}
),
picked AS (
  SELECT doc_id, source, n_tokens, h FROM surv
  QUALIFY SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)
          <= {TOKEN_BUDGET}
)
SELECT doc_id, source, n_tokens,
       ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS pos
FROM picked
"""
