"""Topic clustering straight from raw text: hashed log₂-idf features →
distributed Lloyd k-means → per-doc topic id.

The end-to-end "cluster my corpus by content" operator (CCNet/UniMax-style
mixes often sample per TOPIC, not per source): no embedding table needed —
features are the hashing-trick vectors weighted by an integer idf.

Feature exactness at any scale: the idf weight is bit_length(n_docs // df)
— the integer log₂-idf (length_histogram's bin-length trick), bounded by 64
— so feature components stay ≤ 64 · doc-token-count (~10⁴) and the Lloyd
dist² fits int64 at ANY corpus size, where a raw-rational idf
(n_docs·1e6 // df, idf_hashed_vectors) would overflow the distance
arithmetic once n_docs grows past ~10⁶.

Distribution shape: the idf_hashed_vectors two-exchange chain builds the
(doc, 16-int) feature table once and MATERIALIZES it (doc-count × 17 ints —
the bounded intermediate perplexity_buckets also pins; at 10^12 docs it
would checkpoint through the resumable sink instead), then the kmeans
discipline runs over it: smallest-hash seeding, one streaming pass + one
k×dim exchange per round, O(k·dim) driver folds, a final assignment pass.
Everything integer → bit-identical on any partitioning; the SQL mirror
unrolls the same rounds over the same feature CTEs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.exchange import (
    auto_partitions,
    per_key_blocks,
    pruned_read,
    tune_exchange,
)
from ocrautomator_ray.functions.mix import (
    _HASH_SIGN_SHIFT,
    HASH_DIM,
    SHUFFLE_SEED,
    mix_hash,
    sql_mix_hash,
)

TOPIC_K = 8
TOPIC_ITERS = 2

_COLS = [f"v_{j}" for j in range(HASH_DIM)]
_FEAT_SCHEMA = pa.schema([("doc_id", pa.int64())]
                         + [(c, pa.int64()) for c in _COLS])


def _bit_length(x: np.ndarray) -> np.ndarray:
    """bit_length of positive int64s — frexp exponent, exact below 2^53
    (mirrors DuckDB's length(bin(x)); the length_histogram precedent)."""
    return np.frexp(x.astype(np.float64))[1].astype(np.int64)


def _topic_features(sf_dir: str, committed_only: bool = False) -> rd.Dataset:
    """(doc_id, v_0..v_15) signed log₂-idf hashed vectors for every doc
    with ≥1 token — the idf_hashed_vectors chain with the bounded weight.
    ``committed_only`` restricts the slice (and its df/n_docs statistics)
    to doc_id % INCR_NEW_MOD != 0 — the training side of the incremental
    topic model."""
    from ocrautomator_ray.functions.curate import INCR_NEW_MOD
    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2

    path = f"{sf_dir}/documents.parquet"
    if committed_only:
        n_docs = int(pruned_read(path, ["doc_id"]).map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"].filter(pa.array(
                t["doc_id"].to_numpy(zero_copy_only=False)
                % INCR_NEW_MOD != 0))}),
            batch_format="pyarrow", zero_copy_batch=True).count())
    else:
        n_docs = int(pruned_read(path, ["doc_id"]).count())
    row_schema = pa.schema([
        ("w", pa.string()), ("doc_id", pa.int64()),
        ("bucket", pa.int64()), ("sk", pa.int64()),
    ])

    def token_rows(t: pa.Table) -> pa.Table:
        if committed_only and t.num_rows:
            keep = (t["doc_id"].to_numpy(zero_copy_only=False)
                    % INCR_NEW_MOD != 0)
            t = t.filter(pa.array(keep))
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return row_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, cnt)
        w = flat.to_numpy(zero_copy_only=False)
        h = _fnv1a_strings(flat)
        bucket = (h % np.uint64(HASH_DIM)).astype(np.int64)
        sign = np.where(
            (h >> np.uint64(_HASH_SIGN_SHIFT)) & np.uint64(1) == 1,
            -1, 1).astype(np.int64)
        order = np.lexsort((doc, w))
        w, doc, bucket, sign = w[order], doc[order], bucket[order], sign[order]
        new = np.r_[True, (w[1:] != w[:-1]) | (doc[1:] != doc[:-1])]
        starts = np.flatnonzero(new)
        run = np.diff(np.r_[starts, len(w)])
        return pa.table({
            "w": pa.array(w[starts], pa.string()),
            "doc_id": pa.array(doc[starts], pa.int64()),
            "bucket": pa.array(bucket[starts], pa.int64()),
            "sk": pa.array(sign[starts] * run, pa.int64()),
        })

    contrib_schema = pa.schema([
        ("doc_id", pa.int64()), ("bucket", pa.int64()), ("c", pa.int64()),
    ])

    def attach_idf(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return contrib_schema.empty_table()
        w = block["w"].to_numpy(zero_copy_only=False)
        sk = block["sk"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="mergesort")
        w_s = w[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        run = np.diff(np.r_[starts, len(w_s)])
        df = np.empty(len(w), np.int64)
        df[order] = np.repeat(run, run)
        weight = _bit_length(n_docs // df)
        return pa.table({
            "doc_id": block["doc_id"],
            "bucket": block["bucket"],
            "c": pa.array(sk * weight, pa.int64()),
        })

    def fold_vectors(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _FEAT_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        c = block["c"].to_numpy(zero_copy_only=False)
        uids, inv = np.unique(ids, return_inverse=True)
        out = np.zeros((len(uids), HASH_DIM), np.int64)
        np.add.at(out, (inv, b), c)
        res = {"doc_id": pa.array(uids, pa.int64())}
        for j, col in enumerate(_COLS):
            res[col] = pa.array(out[:, j], pa.int64())
        return pa.table(res)

    nparts = auto_partitions(path)
    rows = pruned_read(path, ["doc_id", "text"]).map_batches(
        token_rows, batch_format="pyarrow", zero_copy_batch=True)
    contribs = per_key_blocks(rows, ["w"], attach_idf, num_partitions=nparts)
    return per_key_blocks(contribs, ["doc_id"], fold_vectors,
                          num_partitions=nparts)


def _feat_matrix(t: pa.Table) -> np.ndarray:
    return np.column_stack(
        [t[c].to_numpy(zero_copy_only=False) for c in _COLS]).astype(np.int64)


def _fit_topics(feats: rd.Dataset, k: int = TOPIC_K,
                iters: int = TOPIC_ITERS) -> np.ndarray:
    """(k, HASH_DIM) int64 topic centroids from smallest-hash seeding +
    ``iters`` distributed Lloyd rounds over a materialized feature table."""
    from ray.data.aggregate import Sum

    # seeds: the k docs with the smallest shuffle hash (lossless bottom-k
    # per-batch prune, driver sorts k × blocks rows)
    def seed_prune(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("h", pa.array([], pa.int64()))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix_hash(ids, SHUFFLE_SEED)
        if len(ids) > k:
            keep = np.lexsort((ids, h))[:k]
            keep.sort()
            t, h = t.take(pa.array(keep)), h[keep]
        return t.append_column("h", pa.array(h, pa.int64()))

    seed_df = (feats.map_batches(seed_prune, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .sort(key=["h", "doc_id"]).limit(k).to_pandas())
    C = np.column_stack([seed_df[c].to_numpy() for c in _COLS]).astype(
        np.int64)

    partial_schema = pa.schema([
        ("cluster", pa.int64()), ("dim", pa.int64()),
        ("s", pa.int64()), ("n", pa.int64()),
    ])
    clusters = np.repeat(np.arange(k, dtype=np.int64), HASH_DIM)
    dims = np.tile(np.arange(1, HASH_DIM + 1, dtype=np.int64), k)

    for _ in range(iters):
        def assign_partial(t: pa.Table, C=C) -> pa.Table:
            if t.num_rows == 0:
                return partial_schema.empty_table()
            X = _feat_matrix(t)
            d = ((X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T)
                 + (C * C).sum(axis=1))
            a = np.argmin(d, axis=1)
            sums = np.zeros((k, HASH_DIM), np.int64)
            np.add.at(sums, a, X)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(clusters, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(counts, HASH_DIM), pa.int64()),
            })

        out = feats.map_batches(assign_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
        tune_exchange(out)
        agg = (out.groupby(["cluster", "dim"], num_partitions=4)
                  .aggregate(Sum("s", alias_name="s"),
                             Sum("n", alias_name="n"))
                  .to_pandas().sort_values(["cluster", "dim"]))
        sums = agg["s"].to_numpy(dtype=np.int64).reshape(k, HASH_DIM)
        ns = agg["n"].to_numpy(dtype=np.int64).reshape(k, HASH_DIM)[:, 0]
        C = C.copy()
        nz = ns > 0
        C[nz] = sums[nz] // ns[nz, None]
    return C


_TOPIC_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                               ("topic", pa.int64())])


def _assign_topics(feats: rd.Dataset, C: np.ndarray) -> rd.Dataset:
    out_schema = _TOPIC_OUT_SCHEMA

    def final_assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        X = _feat_matrix(t)
        d = ((X * X).sum(axis=1, keepdims=True) - 2 * (X @ C.T)
             + (C * C).sum(axis=1))
        return pa.table({
            "doc_id": t["doc_id"],
            "topic": pa.array(np.argmin(d, axis=1).astype(np.int64),
                              pa.int64()),
        })

    return feats.map_batches(final_assign, batch_format="pyarrow",
                             zero_copy_batch=True)


_TOPIC_MODEL_ROOT = "/tmp/ocrauto_topic_model"


def _fit_topics_cached(sf_dir: str, feats: rd.Dataset, k: int,
                       iters: int) -> np.ndarray:
    """_fit_topics behind the shared persisted-model discipline (the
    k-means `_model_path` rule, fingerprinted to the DOCUMENTS table):
    topic_keywords and repeat doc_topics consumers reuse the trained
    centroids with zero Lloyd passes. NOTE: distinct from the
    topic_index_build model, which trains on the COMMITTED slice only for
    the incremental-assignment path — this one is the full-table model."""
    import os

    from ocrautomator_ray.functions.exchange import (
        evict_stale_index_dirs,
        index_fingerprint_dir,
    )

    persist = os.environ.get("OCRA_KMEANS_PERSIST", "1") != "0"
    d = index_fingerprint_dir(_TOPIC_MODEL_ROOT,
                              f"{sf_dir}/documents.parquet")
    evict_stale_index_dirs(d, _TOPIC_MODEL_ROOT)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"centroids-k{k}-i{iters}.npz")
    if persist and os.path.exists(path):
        with np.load(path) as z:
            return z["C"]
    C = _fit_topics(feats, k, iters)
    if persist:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, C=C)
        os.replace(tmp, path)
    return C


def doc_topics(sf_dir: str, k: int = TOPIC_K,
               iters: int = TOPIC_ITERS) -> rd.Dataset:
    """(doc_id, topic): each tokened doc's final Lloyd cluster over the
    log₂-idf hashed features (argmin exact int dist², ties → smaller
    topic; empty topics carry their centroid)."""
    feats = _topic_features(sf_dir).materialize()
    C = _fit_topics_cached(sf_dir, feats, k, iters)
    return _assign_topics(feats, C)


def _sql_doc_topics(k: int = TOPIC_K, iters: int = TOPIC_ITERS) -> str:
    from ocrautomator_ray.functions.dedup import _sql_fnv1a

    h = sql_mix_hash("doc_id", SHUFFLE_SEED)
    parts = [rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
td AS (SELECT doc_id, w, COUNT(*) AS k FROM toks GROUP BY doc_id, w),
dfreq AS (SELECT w, COUNT(*) AS df FROM td GROUP BY w),
nd AS (SELECT COUNT(*) AS n FROM documents),
hw AS (
  SELECT w, {_sql_fnv1a('w')} AS h FROM (SELECT DISTINCT w FROM td)
),
hb AS (
  SELECT w, CAST(h % {HASH_DIM} AS BIGINT) AS b,
         CASE WHEN (h // {1 << _HASH_SIGN_SHIFT}) % 2 = 1
              THEN -1 ELSE 1 END AS sgn
  FROM hw
),
contrib AS (
  SELECT td.doc_id, hb.b AS dim,
         td.k * hb.sgn * length(bin(nd.n // dfreq.df)) AS c
  FROM td JOIN hb USING (w) JOIN dfreq USING (w), nd
),
docs AS (SELECT DISTINCT doc_id FROM td),
dims AS (SELECT CAST(range AS BIGINT) + 1 AS dim FROM range({HASH_DIM})),
featl AS (
  SELECT d.doc_id, dims.dim, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
  FROM docs d CROSS JOIN dims
  LEFT JOIN (SELECT doc_id, dim + 1 AS dim, SUM(c) AS v
             FROM contrib GROUP BY doc_id, dim) s
    ON s.doc_id = d.doc_id AND s.dim = dims.dim
),
seeds AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 AS c
    FROM (SELECT doc_id FROM docs ORDER BY {h}, doc_id LIMIT {k})
),
cent0 AS (
    SELECT s.c, f.dim, f.v FROM seeds s JOIN featl f USING (doc_id)
)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i} AS (
    SELECT doc_id, c FROM (
        SELECT f.doc_id, c.c, SUM((f.v - c.v) * (f.v - c.v)) AS d
        FROM featl f JOIN cent{i - 1} c USING (dim)
        GROUP BY f.doc_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, c) = 1
),
u{i} AS (
    SELECT a.c, f.dim,
           CAST(FLOOR(CAST(SUM(f.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
    FROM a{i} a JOIN featl f USING (doc_id)
    GROUP BY a.c, f.dim
),
cent{i} AS (
    SELECT p.c, p.dim, COALESCE(u.v, p.v) AS v
    FROM cent{i - 1} p LEFT JOIN u{i} u ON u.c = p.c AND u.dim = p.dim
)""")
    parts.append(f""",
tp AS (
    SELECT doc_id, c AS topic FROM (
        SELECT f.doc_id, c.c, SUM((f.v - c.v) * (f.v - c.v)) AS d
        FROM featl f JOIN cent{iters} c USING (dim)
        GROUP BY f.doc_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, c) = 1
)""")
    return "".join(parts)


def _sql_doc_topics_stmt() -> str:
    return _sql_doc_topics() + "\nSELECT doc_id, topic FROM tp\n"


SQL_DOC_TOPICS = _sql_doc_topics_stmt()


QUERIES = {
    "doc_topics": doc_topics,
}

SQL = {
    "doc_topics": SQL_DOC_TOPICS,
}


# ---------------------------------------------------------------------------
# topic_keywords — explain the learned topics: the top tokens of each topic
# by total occurrence count (the table a human reads to name the clusters,
# and the input to topic-balanced mix reports).
#
# Distribution shape: doc_topics' assignment (doc_id, topic — two ints per
# doc) unions with per-batch (doc_id, token, count) combiners into ONE
# doc-keyed exchange that tags each token row with its doc's topic, then a
# (topic, token)-keyed aggregate sums totals; the final per-topic top-N is
# a lossless per-batch prune (post-aggregate rows are final, so each
# batch's top-N per topic is a superset member of the global top-N) + one
# tiny topic-keyed ranking exchange.
# ---------------------------------------------------------------------------

TOPIC_TOP_N = 5


def topic_keywords(sf_dir: str, k: int = TOPIC_K, iters: int = TOPIC_ITERS,
                   top_n: int = TOPIC_TOP_N) -> rd.Dataset:
    """(topic, token, n, rank): each topic's top_n tokens by corpus count
    within the topic, rank by (n DESC, token ASC)."""
    from ocrautomator_ray.functions.dedup import _tokenize_re2

    path = f"{sf_dir}/documents.parquet"
    topics = doc_topics(sf_dir, k, iters).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "w": pa.array([""] * t.num_rows, pa.string()),
                            "k": t["topic"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    row_schema = pa.schema([("doc_id", pa.int64()), ("w", pa.string()),
                            ("k", pa.int64())])

    def token_rows(t: pa.Table) -> pa.Table:
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return row_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, cnt)
        w = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, w))
        w, doc = w[order], doc[order]
        new = np.r_[True, (w[1:] != w[:-1]) | (doc[1:] != doc[:-1])]
        starts = np.flatnonzero(new)
        run = np.diff(np.r_[starts, len(w)])
        return pa.table({
            "doc_id": pa.array(doc[starts], pa.int64()),
            "w": pa.array(w[starts], pa.string()),
            "k": pa.array(run.astype(np.int64), pa.int64()),
        })

    tw_schema = pa.schema([("topic", pa.int64()), ("w", pa.string()),
                           ("n", pa.int64())])

    def tag_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return tw_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        kk = block["k"].to_numpy(zero_copy_only=False)
        is_tag = w == ""
        order = np.argsort(ids[is_tag], kind="mergesort")
        tag_ids, tag_topic = ids[is_tag][order], kk[is_tag][order]
        tok_ids, tok_w, tok_k = ids[~is_tag], w[~is_tag], kk[~is_tag]
        pos = np.searchsorted(tag_ids, tok_ids)
        if len(tok_ids) and (not (pos < len(tag_ids)).all()
                             or not (tag_ids[np.minimum(
                                 pos, len(tag_ids) - 1)] == tok_ids).all()):
            raise RuntimeError("token row co-located without its topic row "
                               "(hash-exchange co-partitioning violated)")
        return pa.table({
            "topic": pa.array(tag_topic[pos] if len(tok_ids)
                              else np.empty(0, np.int64), pa.int64()),
            "w": pa.array(tok_w, pa.string()),
            "n": pa.array(tok_k, pa.int64()),
        })

    def tw_block(block: pa.Table) -> pa.Table:
        # all of a token's rows are co-located → (topic, w) totals are
        # FINAL here (lexsort + reduceat fold; the Sum-aggregate path cost
        # 5× more at 30×, the cmsketch lesson)
        if block.num_rows == 0:
            return tw_schema.empty_table()
        topic = block["topic"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        n = block["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((topic, w))
        topic, w, n = topic[order], w[order], n[order]
        new = np.r_[True, (w[1:] != w[:-1]) | (topic[1:] != topic[:-1])]
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(n, starts).astype(np.int64)
        return pa.table({"topic": pa.array(topic[starts], pa.int64()),
                         "w": pa.array(w[starts], pa.string()),
                         "n": pa.array(tot, pa.int64())})

    nparts = auto_partitions(path)
    rows = pruned_read(path, ["doc_id", "text"]).map_batches(
        token_rows, batch_format="pyarrow", zero_copy_batch=True)
    tagged = per_key_blocks(topics.union(rows), ["doc_id"], tag_block,
                            num_partitions=nparts)
    totals = per_key_blocks(tagged, ["w"], tw_block, num_partitions=nparts)
    out_schema = pa.schema([("topic", pa.int64()), ("token", pa.string()),
                            ("n", pa.int64()), ("rank", pa.int64())])

    def top_block(block: pa.Table) -> pa.Table:
        """Per-topic top_n by (n DESC, token ASC); emits (topic, w, n, rank).
        Used twice: as a lossless per-batch prune over the final aggregate
        rows, then as the block kernel of the topic-keyed ranking exchange."""
        if block.num_rows == 0:
            return pa.schema([("topic", pa.int64()), ("w", pa.string()),
                              ("n", pa.int64()),
                              ("rank", pa.int64())]).empty_table()
        from ocrautomator_ray.functions.dedup import _ramp

        topic = block["topic"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        n = block["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w, -n, topic))
        topic, w, n = topic[order], w[order], n[order]
        starts = np.flatnonzero(np.r_[True, topic[1:] != topic[:-1]])
        run = np.diff(np.r_[starts, len(topic)])
        rank = _ramp(run) + 1
        keep = rank <= top_n
        return pa.table({
            "topic": pa.array(topic[keep], pa.int64()),
            "w": pa.array(w[keep], pa.string()),
            "n": pa.array(n[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
        })

    pruned = totals.map_batches(top_block, batch_format="pyarrow",
                                zero_copy_batch=True)
    ranked = per_key_blocks(pruned, ["topic"], top_block, num_partitions=4)
    return ranked.map_batches(
        lambda t: pa.table({"topic": t["topic"], "token": t["w"],
                            "n": t["n"], "rank": t["rank"]})
        if t.num_rows else out_schema.empty_table(),
        batch_format="pyarrow", zero_copy_batch=True)


def _sql_topic_keywords(top_n: int = TOPIC_TOP_N) -> str:
    return _sql_doc_topics() + f""",
tw AS (
    SELECT tp.topic, td.w, CAST(SUM(td.k) AS BIGINT) AS n
    FROM td JOIN tp USING (doc_id) GROUP BY tp.topic, td.w
)
SELECT topic, w AS token, n, rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY topic
                                      ORDER BY n DESC, w) AS BIGINT) AS rank
    FROM tw)
WHERE rank <= {top_n}
"""


SQL_TOPIC_KEYWORDS = _sql_topic_keywords()

QUERIES["topic_keywords"] = topic_keywords
SQL["topic_keywords"] = SQL_TOPIC_KEYWORDS


# ---------------------------------------------------------------------------
# Incremental topic assignment — the watch-mode path: the topic model
# (frozen df statistics + Lloyd centroids, trained on the COMMITTED slice
# doc_id % INCR_NEW_MOD != 0) persists once; each arriving shard pays only
# its own tokenization and ONE token-keyed exchange against the persisted
# df table to build features with TRAIN-TIME idf weights (the standard
# frozen-idf inference rule; unseen tokens take df = 1, the max-idf
# convention), then a stateless assignment pass. The ivf_index_build /
# neardup_index_build pattern applied to text clustering:
#
# - df table committed through the resumable sink (killed build resumes
#   O(P); rebuilt build no-ops),
# - centroids.parquet + meta.parquet beside it (atomic tmp+rename),
# - query-time cost is O(new shard), never O(corpus).
# ---------------------------------------------------------------------------


def topic_index_dir(sf_dir: str) -> str:
    """Deterministic per-input model location — the shared
    exchange.index_fingerprint_dir rule (same as ann.ivf_index_dir)."""
    import os

    from ocrautomator_ray.functions.exchange import index_fingerprint_dir

    return index_fingerprint_dir(os.path.join("/tmp", "ocrauto_topic_index"),
                                 f"{sf_dir}/documents.parquet")


def _evict_stale_topic_indexes(index_dir: str) -> None:
    import os

    from ocrautomator_ray.functions.exchange import evict_stale_index_dirs

    evict_stale_index_dirs(index_dir,
                           os.path.join("/tmp", "ocrauto_topic_index"))


def topic_index_build(sf_dir: str, k: int = TOPIC_K,
                      iters: int = TOPIC_ITERS) -> str:
    """Train + persist the committed-slice topic model; no-op when the
    model for this input already exists."""
    import os

    import pyarrow.parquet as pqt

    from ocrautomator_ray.functions.curate import INCR_NEW_MOD
    from ocrautomator_ray.functions.dedup import _tokenize_re2
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    index_dir = topic_index_dir(sf_dir)
    meta_path = os.path.join(index_dir, "meta.parquet")
    if os.path.exists(meta_path):
        return index_dir
    _evict_stale_topic_indexes(index_dir)

    path = f"{sf_dir}/documents.parquet"
    feats = _topic_features(sf_dir, committed_only=True).materialize()
    C = _fit_topics(feats, k, iters)

    # persist the committed-slice document frequencies via the resumable
    # sink (token-keyed; a killed build resumes O(P))
    row_schema = pa.schema([("doc_id", pa.int64()), ("w", pa.string())])

    def tok_pairs(t: pa.Table) -> pa.Table:
        keep = (t["doc_id"].to_numpy(zero_copy_only=False)
                % INCR_NEW_MOD != 0)
        t = t.filter(pa.array(keep))
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return row_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, cnt)
        w = flat.to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, w))
        w, doc = w[order], doc[order]
        new = np.r_[True, (w[1:] != w[:-1]) | (doc[1:] != doc[:-1])]
        return pa.table({"doc_id": pa.array(doc[new], pa.int64()),
                         "w": pa.array(w[new], pa.string())})

    df_schema = pa.schema([("w", pa.string()), ("df", pa.int64())])

    def df_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return df_schema.empty_table()
        w = block["w"].to_numpy(zero_copy_only=False)
        order = np.argsort(w, kind="mergesort")
        w_s = w[order]
        starts = np.flatnonzero(np.r_[True, w_s[1:] != w_s[:-1]])
        run = np.diff(np.r_[starts, len(w_s)])
        return pa.table({"w": pa.array(w_s[starts], pa.string()),
                         "df": pa.array(run.astype(np.int64), pa.int64())})

    pairs = pruned_read(path, ["doc_id", "text"]).map_batches(
        tok_pairs, batch_format="pyarrow", zero_copy_batch=True)
    df_rows = per_key_blocks(pairs, ["w"], df_block,
                             num_partitions=auto_partitions(path))
    resumable_write(df_rows, os.path.join(index_dir, "df"),
                    num_partitions=8, key="w",
                    input_desc=f"{path} [committed df]")

    n_committed = int(pruned_read(path, ["doc_id"]).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"].filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False)
            % INCR_NEW_MOD != 0))}),
        batch_format="pyarrow", zero_copy_batch=True).count())
    cent = pa.table({
        "topic": pa.array(np.arange(len(C), dtype=np.int64), pa.int64()),
        "v": pa.array(C.tolist(), pa.list_(pa.int64())),
    })
    tmp = os.path.join(index_dir, f"cent.tmp.{os.getpid()}")
    pqt.write_table(cent, tmp)
    os.replace(tmp, os.path.join(index_dir, "centroids.parquet"))
    meta = pa.table({"n_docs": pa.array([n_committed], pa.int64())})
    tmp = os.path.join(index_dir, f"meta.tmp.{os.getpid()}")
    pqt.write_table(meta, tmp)
    os.replace(tmp, meta_path)
    return index_dir


def incremental_doc_topics(sf_dir: str) -> rd.Dataset:
    """(doc_id, topic) for the NEW shard (doc_id % INCR_NEW_MOD == 0),
    assigned under the persisted committed-slice model: frozen idf weights
    (unseen tokens → df 1), frozen centroids — O(new shard) query cost."""
    import os

    import pyarrow.parquet as pqt

    from ocrautomator_ray.functions.curate import INCR_NEW_MOD
    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2

    index_dir = topic_index_build(sf_dir)
    meta = pqt.read_table(os.path.join(index_dir, "meta.parquet"))
    n_docs = int(meta["n_docs"][0].as_py())
    cent = pqt.read_table(
        os.path.join(index_dir, "centroids.parquet")).sort_by("topic")
    C = np.array(cent["v"].to_pylist(), np.int64)

    path = f"{sf_dir}/documents.parquet"
    row_schema = pa.schema([
        ("w", pa.string()), ("doc_id", pa.int64()),
        ("bucket", pa.int64()), ("sk", pa.int64()), ("df", pa.int64()),
    ])

    def new_token_rows(t: pa.Table) -> pa.Table:
        keep = (t["doc_id"].to_numpy(zero_copy_only=False)
                % INCR_NEW_MOD == 0)
        t = t.filter(pa.array(keep))
        flat, cnt = _tokenize_re2(t["text"])
        if len(flat) == 0:
            return row_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, cnt)
        w = flat.to_numpy(zero_copy_only=False)
        h = _fnv1a_strings(flat)
        bucket = (h % np.uint64(HASH_DIM)).astype(np.int64)
        sign = np.where(
            (h >> np.uint64(_HASH_SIGN_SHIFT)) & np.uint64(1) == 1,
            -1, 1).astype(np.int64)
        order = np.lexsort((doc, w))
        w, doc, bucket, sign = w[order], doc[order], bucket[order], sign[order]
        new = np.r_[True, (w[1:] != w[:-1]) | (doc[1:] != doc[:-1])]
        starts = np.flatnonzero(new)
        run = np.diff(np.r_[starts, len(w)])
        return pa.table({
            "w": pa.array(w[starts], pa.string()),
            "doc_id": pa.array(doc[starts], pa.int64()),
            "bucket": pa.array(bucket[starts], pa.int64()),
            "sk": pa.array(sign[starts] * run, pa.int64()),
            "df": pa.array(np.zeros(len(starts), np.int64), pa.int64()),
        })

    # persisted df rows, tagged with doc_id = -1 so the exchange block can
    # tell model rows from shard rows
    df_read = rd.read_parquet(os.path.join(index_dir, "df", "data"),
                              columns=["w", "df"]).map_batches(
        lambda t: pa.table({
            "w": t["w"],
            "doc_id": pa.array(np.full(t.num_rows, -1, np.int64),
                               pa.int64()),
            "bucket": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "sk": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            "df": t["df"].cast(pa.int64()),
        }), batch_format="pyarrow", zero_copy_batch=True)

    contrib_schema = pa.schema([
        ("doc_id", pa.int64()), ("bucket", pa.int64()), ("c", pa.int64()),
    ])

    def attach_frozen_idf(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return contrib_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        w = block["w"].to_numpy(zero_copy_only=False)
        is_model = ids < 0
        mw = w[is_model]
        mdf = block["df"].to_numpy(zero_copy_only=False)[is_model]
        order = np.argsort(mw, kind="mergesort")
        mw, mdf = mw[order], mdf[order]
        tok = ~is_model
        tw = w[tok]
        pos = np.searchsorted(mw, tw)
        hit = (pos < len(mw))
        safe = np.minimum(pos, max(len(mw) - 1, 0))
        hit &= (mw[safe] == tw) if len(mw) else False
        df = np.where(hit, mdf[safe] if len(mw) else 1, 1).astype(np.int64)
        weight = _bit_length(n_docs // df)
        return pa.table({
            "doc_id": pa.array(ids[tok], pa.int64()),
            "bucket": block["bucket"].filter(pa.array(tok)),
            "c": pa.array(
                block["sk"].to_numpy(zero_copy_only=False)[tok] * weight,
                pa.int64()),
        })

    def fold_vectors(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _FEAT_SCHEMA.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        b = block["bucket"].to_numpy(zero_copy_only=False)
        c = block["c"].to_numpy(zero_copy_only=False)
        uids, inv = np.unique(ids, return_inverse=True)
        out = np.zeros((len(uids), HASH_DIM), np.int64)
        np.add.at(out, (inv, b), c)
        res = {"doc_id": pa.array(uids, pa.int64())}
        for j, col in enumerate(_COLS):
            res[col] = pa.array(out[:, j], pa.int64())
        return pa.table(res)

    nparts = auto_partitions(path)
    rows = pruned_read(path, ["doc_id", "text"]).map_batches(
        new_token_rows, batch_format="pyarrow", zero_copy_batch=True)
    contribs = per_key_blocks(rows.union(df_read), ["w"], attach_frozen_idf,
                              num_partitions=nparts)
    feats = per_key_blocks(contribs, ["doc_id"], fold_vectors,
                           num_partitions=nparts)
    return _assign_topics(feats, C)


def _sql_incremental_doc_topics(k: int = TOPIC_K,
                                iters: int = TOPIC_ITERS) -> str:
    from ocrautomator_ray.functions.curate import INCR_NEW_MOD
    from ocrautomator_ray.functions.dedup import _sql_fnv1a

    h = sql_mix_hash("doc_id", SHUFFLE_SEED)
    parts = [rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
td_c AS (SELECT doc_id, w, COUNT(*) AS k FROM toks
         WHERE doc_id % {INCR_NEW_MOD} != 0 GROUP BY doc_id, w),
td_n AS (SELECT doc_id, w, COUNT(*) AS k FROM toks
         WHERE doc_id % {INCR_NEW_MOD} = 0 GROUP BY doc_id, w),
dfreq AS (SELECT w, COUNT(*) AS df FROM td_c GROUP BY w),
nd AS (SELECT COUNT(*) AS n FROM documents
       WHERE doc_id % {INCR_NEW_MOD} != 0),
hw AS (
  SELECT w, {_sql_fnv1a('w')} AS h
  FROM (SELECT w FROM td_c UNION SELECT w FROM td_n)
),
hb AS (
  SELECT w, CAST(h % {HASH_DIM} AS BIGINT) AS b,
         CASE WHEN (h // {1 << _HASH_SIGN_SHIFT}) % 2 = 1
              THEN -1 ELSE 1 END AS sgn
  FROM hw
),
contrib_c AS (
  SELECT td_c.doc_id, hb.b AS dim,
         td_c.k * hb.sgn * length(bin(nd.n // dfreq.df)) AS c
  FROM td_c JOIN hb USING (w) JOIN dfreq USING (w), nd
),
docs_c AS (SELECT DISTINCT doc_id FROM td_c),
dims AS (SELECT CAST(range AS BIGINT) + 1 AS dim FROM range({HASH_DIM})),
featl AS (
  SELECT d.doc_id, dims.dim, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
  FROM docs_c d CROSS JOIN dims
  LEFT JOIN (SELECT doc_id, dim + 1 AS dim, SUM(c) AS v
             FROM contrib_c GROUP BY doc_id, dim) s
    ON s.doc_id = d.doc_id AND s.dim = dims.dim
),
seeds AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY {h}, doc_id) - 1 AS c
    FROM (SELECT doc_id FROM docs_c ORDER BY {h}, doc_id LIMIT {k})
),
cent0 AS (
    SELECT s.c, f.dim, f.v FROM seeds s JOIN featl f USING (doc_id)
)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
a{i} AS (
    SELECT doc_id, c FROM (
        SELECT f.doc_id, c.c, SUM((f.v - c.v) * (f.v - c.v)) AS d
        FROM featl f JOIN cent{i - 1} c USING (dim)
        GROUP BY f.doc_id, c.c)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, c) = 1
),
u{i} AS (
    SELECT a.c, f.dim,
           CAST(FLOOR(CAST(SUM(f.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
    FROM a{i} a JOIN featl f USING (doc_id)
    GROUP BY a.c, f.dim
),
cent{i} AS (
    SELECT p.c, p.dim, COALESCE(u.v, p.v) AS v
    FROM cent{i - 1} p LEFT JOIN u{i} u ON u.c = p.c AND u.dim = p.dim
)""")
    parts.append(f""",
contrib_n AS (
  SELECT td_n.doc_id, hb.b AS dim,
         td_n.k * hb.sgn * length(bin(nd.n // COALESCE(dfreq.df, 1))) AS c
  FROM td_n JOIN hb USING (w) LEFT JOIN dfreq USING (w), nd
),
docs_n AS (SELECT DISTINCT doc_id FROM td_n),
featl_n AS (
  SELECT d.doc_id, dims.dim, CAST(COALESCE(s.v, 0) AS BIGINT) AS v
  FROM docs_n d CROSS JOIN dims
  LEFT JOIN (SELECT doc_id, dim + 1 AS dim, SUM(c) AS v
             FROM contrib_n GROUP BY doc_id, dim) s
    ON s.doc_id = d.doc_id AND s.dim = dims.dim
)
SELECT doc_id, c AS topic FROM (
    SELECT f.doc_id, c.c, SUM((f.v - c.v) * (f.v - c.v)) AS d
    FROM featl_n f JOIN cent{iters} c USING (dim)
    GROUP BY f.doc_id, c.c)
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, c) = 1
""")
    return "".join(parts)


SQL_INCREMENTAL_DOC_TOPICS = _sql_incremental_doc_topics()

QUERIES["incremental_doc_topics"] = incremental_doc_topics
SQL["incremental_doc_topics"] = SQL_INCREMENTAL_DOC_TOPICS
