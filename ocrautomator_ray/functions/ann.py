"""Similarity search over the embeddings table: brute-force cosine top-k
(baseline) and an LSH-bucketed approximate variant (the scale path).

Brute force: the query matrix is broadcast once (ray.put); every batch does
one float64 matmul against it and emits batch-local top-k candidate rows
(partial top-k — the combiner), then a small groupby(query) selects the global
top-k. The shuffle moves only num_queries × k rows per batch, never the
embedding table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.exchange import (
    per_key_blocks,
    pruned_read,
    stripped_read,
)

ANN_NUM_QUERIES = 10
ANN_K = 5

_PARTIAL_SCHEMA = pa.schema([("qid", pa.int64()), ("vec_id", pa.int64()),
                             ("sim", pa.float64())])


def _embed_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, dim) float64 matrix from a fixed-dim list<float> column, zero-copy
    through the flat values buffer (no per-row Python list materialization —
    ``np.stack(to_pylist())`` was measurably slower on wide batches and
    crashed on empty blocks)."""
    import pyarrow.compute as pc

    emb = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
    flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False)
    return flat.astype(np.float64).reshape(t.num_rows, -1)


def _load_queries(sf_dir: str, num_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    ds = stripped_read(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pc.field("vec_id") < num_queries),
    )
    t = ds.to_pandas().sort_values("vec_id")
    qids = t["vec_id"].to_numpy(dtype=np.int64)
    Q = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    return qids, Q / np.linalg.norm(Q, axis=1, keepdims=True)


def ann_topk(sf_dir: str, num_queries: int = ANN_NUM_QUERIES, k: int = ANN_K) -> rd.Dataset:
    """Exact cosine top-k neighbors for the first `num_queries` vec_ids.

    Output: (qid, vec_id, rank) with rank 1..k ordered by (cos desc, vec_id).
    Self-matches excluded. Ties broken by vec_id so the set is deterministic.
    """
    import ray

    qids, Qn = _load_queries(sf_dir, num_queries)
    ref = ray.put((qids, Qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # pruned reads can split small tables into empty blocks
            return _PARTIAL_SCHEMA.empty_table()
        q_ids, Q = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _embed_matrix(t)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = Q @ En.T  # (num_queries, batch)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            s = sims[qi]
            mask = ids != qid
            cand_ids, cand_s = ids[mask], s[mask]
            if len(cand_ids) > k:
                # batch-local top-k with (−sim, vec_id) tie-break
                order = np.lexsort((cand_ids, -cand_s))[:k]
            else:
                order = np.lexsort((cand_ids, -cand_s))
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(cand_s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = g.take(pc.sort_indices(g, sort_keys=[
            ("sim", "descending"), ("vec_id", "ascending")])).slice(0, k)
        return pa.table({
            "qid": s["qid"], "vec_id": s["vec_id"],
            "rank": pa.array(np.arange(1, s.num_rows + 1, dtype=np.int64),
                             pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid", num_partitions=4)
        .map_groups(final_topk, batch_format="pyarrow")
    )


SQL_ANN_TOPK = f"""
WITH q AS (
    SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
),
s AS (
    SELECT q.qid, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.qid
)
SELECT qid, vec_id, rank FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
    FROM s
) WHERE rank <= {ANN_K}
"""


def hard_negatives(sf_dir: str, num_queries: int = ANN_NUM_QUERIES,
                   k: int = ANN_K) -> rd.Dataset:
    """(qid, vec_id, rank): for each query vector, the k most-similar
    vectors with a DIFFERENT label — hard-negative mining for contrastive
    training (the nearly-confusable cross-class examples a retrieval or
    embedding model learns the most from). Same brute-force combiner shape
    as ann_topk (one matmul per batch, num_queries×k rows to the shuffle)
    with the label predicate applied inside the batch mask; the
    metadata-FILTERED variant of vector search every production store
    exposes. At corpus scale the LSH/IVF escapes apply unchanged — the
    filter composes with any candidate source."""
    import ray

    import pyarrow.compute as pc

    qt = stripped_read(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filter=(pc.field("vec_id") < num_queries),
    ).to_pandas().sort_values("vec_id")
    qids = qt["vec_id"].to_numpy(dtype=np.int64)
    qlabels = qt["label"].to_numpy(dtype=np.int64)
    Q = np.stack(qt["embedding"].to_numpy()).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, qlabels, Qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        q_ids, q_labels, Q_ = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        labels = t["label"].to_numpy(zero_copy_only=False)
        E = _embed_matrix(t)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = Q_ @ En.T
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = (ids != qid) & (labels != q_labels[qi])
            if not mask.any():
                continue
            cand_ids, cand_s = ids[mask], sims[qi][mask]
            order = np.lexsort((cand_ids, -cand_s))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(cand_s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = g.take(pc.sort_indices(g, sort_keys=[
            ("sim", "descending"), ("vec_id", "ascending")])).slice(0, k)
        return pa.table({
            "qid": s["qid"], "vec_id": s["vec_id"],
            "rank": pa.array(np.arange(1, s.num_rows + 1, dtype=np.int64),
                             pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding", "label"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("qid", num_partitions=4)
        .map_groups(final_topk, batch_format="pyarrow")
    )


SQL_HARD_NEGATIVES = f"""
WITH q AS (
    SELECT vec_id AS qid, label AS qlabel,
           CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {ANN_NUM_QUERIES}
),
s AS (
    SELECT q.qid, e.vec_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS sim
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id <> q.qid AND e.label <> q.qlabel
)
SELECT qid, vec_id, rank FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
    FROM s
) WHERE rank <= {ANN_K}
"""


# ---------------------------------------------------------------------------
# lsh_ann_topk — approximate variant: sign-LSH bucketed probe (the scale path)
# ---------------------------------------------------------------------------

LSH_PLANES = 6  # 2^6 buckets; multi-probe out to hamming-2 neighbors


def lsh_ann_topk(sf_dir: str, num_queries: int = ANN_NUM_QUERIES, k: int = ANN_K) -> rd.Dataset:
    """Approximate top-k: random-hyperplane LSH buckets, multi-probe search.

    Each embedding row gets a bucket id = sign bits of R·v (R seeded, shared).
    A query probes its own bucket plus all hamming-1 buckets. Recall < 1 by
    design; pytest pins recall ≥ 0.6 vs the exact baseline at test scale.
    Output: (qid, vec_id, rank) among probed candidates.
    """
    import ray

    qids, Qn = _load_queries(sf_dir, num_queries)
    dim = Qn.shape[1]
    R = np.random.default_rng(0x5EED).standard_normal((LSH_PLANES, dim))
    q_buckets = (Qn @ R.T > 0) @ (1 << np.arange(LSH_PLANES))
    # dense probe lookup table (num_queries × 2^planes bools): row qi is True
    # at every bucket within hamming-2 of the query's own bucket — the batch
    # membership test is then one fancy-index gather, no per-element Python
    probe_lut = np.zeros((len(qids), 1 << LSH_PLANES), dtype=bool)
    for qi, b in enumerate(q_buckets):
        probe_lut[qi, int(b)] = True
        for p in range(LSH_PLANES):          # hamming-1 …
            probe_lut[qi, int(b) ^ (1 << p)] = True
            for p2 in range(p + 1, LSH_PLANES):  # … and hamming-2 probes
                probe_lut[qi, int(b) ^ (1 << p) ^ (1 << p2)] = True
    ref = ray.put((qids, Qn, R, probe_lut))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        q_ids, Q, R_, lut = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _embed_matrix(t)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        buckets = (En @ R_.T > 0) @ (1 << np.arange(LSH_PLANES))
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = lut[qi, buckets]
            mask &= ids != qid
            if not mask.any():
                continue
            cand_ids, cand_E = ids[mask], En[mask]
            s = Q[qi] @ cand_E.T
            order = np.lexsort((cand_ids, -s))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = g.take(pc.sort_indices(g, sort_keys=[
            ("sim", "descending"), ("vec_id", "ascending")])).slice(0, k)
        return pa.table({
            "qid": s["qid"], "vec_id": s["vec_id"],
            "rank": pa.array(np.arange(1, s.num_rows + 1, dtype=np.int64),
                             pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid", num_partitions=4)
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# ivf_ann_topk — inverted-file ANN (the second scale path, IVF-flat style)
# ---------------------------------------------------------------------------

IVF_CENTROIDS = 16
IVF_PROBE = 4
IVF_TRAIN_SAMPLE = 4096  # bounded driver-side k-means sample (the small side)


def _train_centroids(sf_dir: str, n_centroids: int = IVF_CENTROIDS,
                     iters: int = 8) -> np.ndarray:
    """Spherical k-means on a bounded deterministic sample.

    The sample (≤ IVF_TRAIN_SAMPLE rows) is the only thing that ever reaches
    the driver — centroid training is the classic small-side step of IVF
    index builds; the full table is assigned to centroids distributedly.
    Deterministic by VALUE, not by stream order: membership is a pure
    predicate on vec_id (every 4th id under a fixed ceiling), never
    ``limit()`` over an unordered streaming read, so two runs always train
    on identical rows regardless of block completion order. Then first-k
    init, fixed iteration count.
    """
    import pyarrow.compute as pc

    ds = stripped_read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filter=((pc.bit_wise_and(pc.field("vec_id"), 3) == 0)
                & (pc.field("vec_id") < 4 * IVF_TRAIN_SAMPLE)),
    )
    t = ds.to_pandas().sort_values("vec_id")
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = Xn[m].mean(axis=0)
                C[c] = v / np.linalg.norm(v)
    return C


def ivf_ann_topk(sf_dir: str, num_queries: int = ANN_NUM_QUERIES,
                 k: int = ANN_K, n_probe: int = IVF_PROBE) -> rd.Dataset:
    """Approximate top-k via an inverted-file index (IVF-flat).

    Centroids are trained once on a bounded sample and broadcast with the
    queries; each batch assigns its vectors to the nearest centroid (one
    argmax matmul) and scores a query only against vectors whose centroid is
    among the query's `n_probe` nearest — the classic IVF probe. Recall < 1
    by design; pytest pins recall vs the exact baseline. At index-build
    scale the assignment column would be written once (partitioned by
    centroid) so probes prune at the read instead of per batch.
    Output: (qid, vec_id, rank) among probed candidates.
    """
    import ray

    qids, Qn = _load_queries(sf_dir, num_queries)
    C = _train_centroids(sf_dir)
    # each query's probe set: its n_probe nearest centroids
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, Qn, C, probe))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        q_ids, Q, C_, probe_ = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _embed_matrix(t)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        assign = np.argmax(En @ C_.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = np.isin(assign, probe_[qi]) & (ids != qid)
            if not mask.any():
                continue
            cand_ids, cand_E = ids[mask], En[mask]
            s = Q[qi] @ cand_E.T
            order = np.lexsort((cand_ids, -s))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = g.take(pc.sort_indices(g, sort_keys=[
            ("sim", "descending"), ("vec_id", "ascending")])).slice(0, k)
        return pa.table({
            "qid": s["qid"], "vec_id": s["vec_id"],
            "rank": pa.array(np.arange(1, s.num_rows + 1, dtype=np.int64),
                             pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid", num_partitions=4)
        .map_groups(final_topk, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# ivf_index_build / ivf_index_topk — the persisted-index completion of the
# IVF story: the centroid assignment is written ONCE through the generic
# resumable sink, hive-partitioned by centroid, and probes then PRUNE AT THE
# READ (only n_probe of the centroid directories are ever opened) instead of
# re-assigning every batch on every query. This is the shape that matters at
# 10^12 rows: the index build is a single streaming pass + partitioned write,
# and each query's IO is n_probe/NCENTROIDS of the table.
# ---------------------------------------------------------------------------


def ivf_index_dir(sf_dir: str) -> str:
    """Deterministic per-input index location under /tmp, fingerprinted by
    (dir basename, full-path hash, size, mtime_ns) via the shared
    exchange.index_fingerprint_dir rule, so a changed input never reuses a
    stale index (the resumable sink would otherwise skip committed
    partitions) and same-named dirs of different corpora never share an
    eviction key."""
    import os

    from ocrautomator_ray.functions.exchange import index_fingerprint_dir

    return index_fingerprint_dir(os.path.join("/tmp", "ocrauto_ivf_index"),
                                 f"{sf_dir}/embeddings.parquet")


_IVF_INDEX_ROOT = os.path.join("/tmp", "ocrauto_ivf_index")


def _centroids_path(index_dir: str) -> str:
    return os.path.join(index_dir, "centroids.parquet")


def _write_centroids(index_dir: str, C: np.ndarray) -> None:
    """Persist the trained centroid matrix beside ``data/`` (atomic
    tmp+rename, same discipline as the sink) so probes are read-only."""
    import pyarrow.parquet as pq

    os.makedirs(index_dir, exist_ok=True)
    path = _centroids_path(index_dir)
    t = pa.table({
        "centroid": pa.array(np.arange(len(C), dtype=np.int32), pa.int32()),
        "v": pa.array(C.tolist(), pa.list_(pa.float64())),
    })
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def _read_centroids(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(_centroids_path(index_dir)).sort_by("centroid")
    return _embed_matrix(t, "v")


def _evict_stale_indexes(index_dir: str) -> None:
    from ocrautomator_ray.functions.exchange import evict_stale_index_dirs

    evict_stale_index_dirs(index_dir, _IVF_INDEX_ROOT)


def _make_assign(C: np.ndarray):
    """Per-batch nearest-centroid assignment against the broadcast centroid
    matrix — shared by the base build and epoch appends so both layouts are
    assigned by byte-identical arithmetic."""
    import ray

    ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # derive the empty table from the INPUT schema: a hand-written
            # large_list(float32) here diverges from the source's
            # list<float32> and Ray's block concat refuses to merge the two
            return t.append_column("centroid", pa.array([], pa.int32()))
        En = _embed_matrix(t)
        En = En / np.linalg.norm(En, axis=1, keepdims=True)
        cent = np.argmax(En @ ray.get(ref).T, axis=1).astype(np.int32)
        return t.append_column("centroid", pa.array(cent, pa.int32()))

    return assign


def ivf_index_build(sf_dir: str, index_dir: str | None = None,
                    num_partitions: int = 8) -> dict:
    """Build (or resume) the persisted IVF-flat index: one distributed
    assignment pass (argmax matmul per batch against the broadcast centroid
    matrix) written via the resumable sink with ``partition_by="centroid"``,
    so the layout is ``data/centroid=<c>/part-NNNNN.parquet`` — selective
    probes read single value directories, and a killed build resumes with
    O(P) manifest reads. The centroid matrix is persisted with the index
    (``centroids.parquet``) at first build, so a committed index answers
    queries with ZERO k-means work and no re-read of the training sample.
    Returns the sink summary plus ``index_dir``."""
    import ray

    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    index_dir = index_dir or ivf_index_dir(sf_dir)
    _evict_stale_indexes(index_dir)
    if os.path.exists(_centroids_path(index_dir)):
        C = _read_centroids(index_dir)  # committed index: no k-means
    else:
        C = _train_centroids(sf_dir)
        _write_centroids(index_dir, C)
    assign = _make_assign(C)
    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])
    summary = resumable_write(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        index_dir, num_partitions=num_partitions, key="vec_id",
        input_desc=f"{sf_dir}/embeddings.parquet", partition_by="centroid")
    summary["index_dir"] = index_dir
    summary["centroid_dirs"] = sorted(
        d for d in os.listdir(os.path.join(index_dir, "data"))
        if d.startswith("centroid="))
    return summary


def ivf_index_append(new_path: str, index_dir: str,
                     num_partitions: int = 4) -> dict:
    """Fold a NEW embeddings fragment into a committed index without
    rebuilding: assign only the fragment's vectors against the PERSISTED
    centroid matrix (zero training) and commit them as an epoch sub-sink —
    ``epochs/<basename>-<size>-<mtime_ns>/`` with its own manifests and the
    same hive ``centroid=<c>`` layout. The watch-mode path: at 10^12 rows an
    arriving fragment is a millionth of the table and a full rebuild is not
    an option; append cost is O(fragment), probe cost stays n_probe/NC of
    the (now larger) table. Idempotent: the epoch tag fingerprints the
    fragment, so re-appending the same file resumes to a no-op, and a
    killed append resumes with O(P) manifest reads like any sink. Probes
    union base + epoch value directories (``ivf_probe_dirs``), so
    ``ivf_index_topk`` sees appended vectors with no code change. Mirrors
    the centroid-stability tradeoff of every production IVF: appends do not
    move centroids; retrain+rebuild when drift accumulates."""
    from ocrautomator_ray.sinks.parquet_commit import resumable_write

    st = os.stat(new_path)
    tag = f"{os.path.basename(new_path)}-{st.st_size}-{st.st_mtime_ns}"
    epoch_dir = os.path.join(index_dir, "epochs", tag)
    assign = _make_assign(_read_centroids(index_dir))
    ds = pruned_read(new_path, ["vec_id", "embedding"])
    summary = resumable_write(
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        epoch_dir, num_partitions=num_partitions, key="vec_id",
        input_desc=new_path, partition_by="centroid")
    summary["epoch_dir"] = epoch_dir
    return summary


def ivf_probe_dirs(index_dir: str, probe: np.ndarray) -> list[str]:
    """The centroid value directories a probe set actually touches — the
    union over queries of their n_probe nearest centroids, intersected with
    the directories that exist (a centroid with no vectors writes none).
    Epoch sub-sinks from ``ivf_index_append`` contribute their value dirs
    too, so queries see appended vectors."""
    import os

    want = sorted({int(c) for c in probe.reshape(-1)})
    roots = [os.path.join(index_dir, "data")]
    epochs = os.path.join(index_dir, "epochs")
    if os.path.isdir(epochs):
        roots += [os.path.join(epochs, e, "data")
                  for e in sorted(os.listdir(epochs))]
    dirs = [os.path.join(r, f"centroid={c}") for r in roots for c in want]
    return [d for d in dirs if os.path.isdir(d)]


def ivf_probe_fragments(index_dir: str, probe: np.ndarray) -> list[str]:
    """Parquet fragments under the probed directories (read_parquet wants
    file paths when given an explicit list)."""
    import os

    return sorted(
        os.path.join(d, f)
        for d in ivf_probe_dirs(index_dir, probe)
        for f in os.listdir(d) if f.endswith(".parquet"))


def ivf_index_topk(sf_dir: str, num_queries: int = ANN_NUM_QUERIES,
                   k: int = ANN_K, n_probe: int = IVF_PROBE) -> rd.Dataset:
    """Pruned-probe query over the persisted IVF index: rows-identical to
    ``ivf_ann_topk`` (same centroids, same probe sets, same scoring) but the
    read opens ONLY the probed ``centroid=<c>`` directories and each batch
    filters per query on the STORED assignment column instead of recomputing
    the argmax. pytest pins both the equality and the pruning (probed dirs ⊊
    all dirs when the probe union is proper), plus that a committed index
    answers with zero k-means iterations (centroids load from the persisted
    ``centroids.parquet``, never retrain)."""
    import ray

    ivf_index_build(sf_dir)  # no-op when already committed (O(P) manifest reads)
    index_dir = ivf_index_dir(sf_dir)
    qids, Qn = _load_queries(sf_dir, num_queries)
    C = _read_centroids(index_dir)  # persisted with the index; no retraining
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, Qn, probe))

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        q_ids, Q, probe_ = ray.get(ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        cent = t["centroid"].to_numpy(zero_copy_only=False)
        En = _embed_matrix(t)
        En = En / np.linalg.norm(En, axis=1, keepdims=True)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            mask = np.isin(cent, probe_[qi]) & (ids != qid)
            if not mask.any():
                continue
            cand_ids, cand_E = ids[mask], En[mask]
            s = Q[qi] @ cand_E.T
            order = np.lexsort((cand_ids, -s))[:k]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    def final_topk(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = g.take(pc.sort_indices(g, sort_keys=[
            ("sim", "descending"), ("vec_id", "ascending")])).slice(0, k)
        return pa.table({
            "qid": s["qid"], "vec_id": s["vec_id"],
            "rank": pa.array(np.arange(1, s.num_rows + 1, dtype=np.int64),
                             pa.int64()),
        })

    ds = rd.read_parquet(ivf_probe_fragments(index_dir, probe))
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qid", num_partitions=4)
        .map_groups(final_topk, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# label_centroids — exact per-label elementwise vector aggregation (the
# centroid building block of IVF/k-means and class-prototype computation),
# demonstrating aggregation OVER a vector column, which Ray Data has no
# native aggregate for. Per batch: flatten the fixed-dim list column to an
# (n, dim) matrix (zero-copy), integerize each element to micros, and
# scatter-add per label — the shuffle then moves labels × dim partial-sum
# rows per batch, never embedding rows. Element-wise integerization keeps
# the distributed sum bit-exact under any combine order (float sums are
# order-dependent; int64 sums are not).
# --------------------------------------------------------------------------

def label_centroids(sf_dir: str) -> rd.Dataset:
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["label", "embedding"])

    partial_schema = pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                                ("sum_micros", pa.int64()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty blocks are routine (filtered/starved reads)
            return partial_schema.empty_table()
        micros = np.floor(_embed_matrix(t) * 1e6 + 0.5).astype(np.int64)
        dim = micros.shape[1]
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, micros)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "sum_micros": pa.array(sums.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    from ocrautomator_ray.functions.exchange import tune_exchange

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    tune_exchange(out)
    return out.groupby(["label", "dim"], num_partitions=8).aggregate(
        Sum("sum_micros", alias_name="sum_micros"), Sum("n", alias_name="n")
    )


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim AS BIGINT) AS dim,
       -- CAST first: bare v*1000000 would round in float32 before promotion
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE)*1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_micros,
       COUNT(*) AS n
FROM (
    SELECT label, generate_subscripts(embedding, 1) AS dim,
           unnest(embedding) AS v
    FROM embeddings
)
GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# label_dispersion — per-(label, dim) second moments (intra-cluster variance)
# ---------------------------------------------------------------------------
#
# The second-moment extension of label_centroids: per (label, dim) the
# mergeable sufficient statistics (n, Σe, Σe²) of the micro-int embedding
# values — what a SemDeDup deployment reads to pick its per-cluster epsilon,
# and what an embedding-drift monitor compares across snapshots.  Variance
# is consumer-side float ((Σe² − (Σe)²/n)/n); the OPERATOR stays all-integer
# so the distributed result is bit-exact on any partitioning.  Overflow
# bound: Σe² < 2^63 holds while a single label holds < ~9.2e6 vectors at
# micro scale — past that a 100-TB run drops to milli-ints (same note as
# bigram_lm_score's scale constant) or splits labels finer, which the
# SemDeDup scale path requires anyway.


def label_dispersion(sf_dir: str) -> rd.Dataset:
    """(label, dim, n, sum_micros, sumsq_micros): count / sum / sum-of-
    squares of each embedding dimension per label, in exact micro-int
    units — the classic partial+final moments aggregate over a vector
    column (labels × dims result rows, one hash exchange)."""
    from ray.data.aggregate import Sum

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["label", "embedding"])

    partial_schema = pa.schema([
        ("label", pa.int64()), ("dim", pa.int64()),
        ("sum_micros", pa.int64()), ("sumsq_micros", pa.int64()),
        ("n", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return partial_schema.empty_table()
        micros = np.floor(_embed_matrix(t) * 1e6 + 0.5).astype(np.int64)
        dim = micros.shape[1]
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), dim), dtype=np.int64)
        sqs = np.zeros((len(uniq), dim), dtype=np.int64)
        np.add.at(sums, inv, micros)
        np.add.at(sqs, inv, micros * micros)
        counts = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "sum_micros": pa.array(sums.reshape(-1), pa.int64()),
            "sumsq_micros": pa.array(sqs.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    from ocrautomator_ray.functions.exchange import tune_exchange

    out = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    tune_exchange(out)
    return out.groupby(["label", "dim"], num_partitions=8).aggregate(
        Sum("sum_micros", alias_name="sum_micros"),
        Sum("sumsq_micros", alias_name="sumsq_micros"),
        Sum("n", alias_name="n"),
    )


SQL_LABEL_DISPERSION = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(dim AS BIGINT) AS dim,
       CAST(SUM(e) AS BIGINT) AS sum_micros,
       CAST(SUM(e * e) AS BIGINT) AS sumsq_micros,
       COUNT(*) AS n
FROM (
    SELECT label, generate_subscripts(embedding, 1) AS dim,
           CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
                AS BIGINT) AS e
    FROM embeddings
)
GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# embedding_outliers — farthest-from-centroid vectors per label
# ---------------------------------------------------------------------------

def _label_centroid_matrix(sf_dir: str):
    """(sorted labels, label→row dict, (labels, dim) int64 centroid matrix)
    in exact micro-int units: centroid = floor(sum/n + ½) computed as
    (2·sum + n) floor-div 2n in pure int arithmetic, so every consumer's
    distance math is int64-exact and partition-invariant. Driver-side size
    is labels × dims — the classic small broadcast side."""
    cent = label_centroids(sf_dir).to_pandas()  # labels × dims rows — tiny
    s = cent["sum_micros"].to_numpy()
    n = cent["n"].to_numpy()
    c = np.floor_divide(2 * s + n, 2 * n)
    dim = int(cent["dim"].max())
    labels = np.sort(cent["label"].unique())
    lab_pos = {int(l): i for i, l in enumerate(labels)}
    cmat = np.zeros((len(labels), dim), np.int64)
    cmat[[lab_pos[int(l)] for l in cent["label"]],
         cent["dim"].to_numpy() - 1] = c
    return labels, lab_pos, cmat

OUTLIER_K = 3


def embedding_outliers(sf_dir: str, k: int = OUTLIER_K) -> rd.Dataset:
    """(label, vec_id, dist2): the k vectors farthest (squared L2, micro-int
    units) from their label's centroid — anomaly screening for embedding
    tables (mislabeled rows, encoder glitches).

    Two-pass broadcast-stats shape (as event_value_zscore): pass 1 reuses
    the label_centroids partial+groupby to reduce the table to labels×dims
    integer rows on the driver; centroids are rounded to EXACT integers
    ((2·sum + n) floor-div 2n — floor(sum/n + ½) in pure int arithmetic), so
    dist2 = Σ (e_micro − c)² is int64-exact and partition-invariant. Pass 2
    is one streaming map with a per-batch per-label top-k partial (lossless:
    the global top-k is a subset of batch top-ks), then a tiny label
    exchange finalizes."""
    labels, lab_pos, cmat = _label_centroid_matrix(sf_dir)

    out_schema = pa.schema([("label", pa.int64()), ("vec_id", pa.int64()),
                            ("dist2", pa.int64())])

    def topk_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        if "dist2" in t.column_names:          # final pass over partials
            d2 = t["dist2"].to_numpy(zero_copy_only=False)
        else:                                  # first pass over raw vectors
            # _embed_matrix (list_flatten) respects slice offsets, unlike
            # ListArray.values which returns the unsliced child buffer
            micros = np.floor(_embed_matrix(t) * 1e6 + 0.5).astype(np.int64)
            diff = micros - cmat[[lab_pos[int(l)] for l in lab]]
            d2 = np.einsum("ij,ij->i", diff, diff)
        # per-label top-k: sort by (label, -dist2, vec_id), rank within runs
        order = np.lexsort((ids, -d2, lab))
        ls = lab[order]
        starts = np.nonzero(np.r_[True, ls[1:] != ls[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(ls)])
        from ocrautomator_ray.functions.dedup import _ramp

        keep = order[_ramp(run_len) < k]
        return pa.table({
            "label": pa.array(lab[keep], pa.int64()),
            "vec_id": pa.array(ids[keep], pa.int64()),
            "dist2": pa.array(d2[keep], pa.int64()),
        })

    from ocrautomator_ray.functions.exchange import per_key_blocks

    ds = pruned_read(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "label", "embedding"])
    partials = ds.map_batches(topk_block, batch_format="pyarrow",
                              zero_copy_batch=True)
    return per_key_blocks(partials, ["label"], topk_block, num_partitions=4)


SQL_EMBEDDING_OUTLIERS = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
), cent AS (
  SELECT label, dim,
         CAST(FLOOR((2.0*SUM(v) + COUNT(*)) / (2*COUNT(*))) AS BIGINT) AS c
  FROM e GROUP BY label, dim
), d AS (
  SELECT e.vec_id, e.label,
         CAST(SUM((e.v - c.c)*(e.v - c.c)) AS BIGINT) AS dist2
  FROM e JOIN cent c ON e.label = c.label AND e.dim = c.dim
  GROUP BY e.vec_id, e.label
)
SELECT label, vec_id, dist2
FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY label
                           ORDER BY dist2 DESC, vec_id) <= {OUTLIER_K}
"""


# ---------------------------------------------------------------------------
# embedding_quantize — per-dimension min-max int8 quantization (the storage /
# bandwidth compression step of large ANN deployments: 4× smaller vectors,
# scan-time dequantize). Two passes: (1) per-dim (lo, hi) reduces to a
# dims-sized table per batch (the classic small side — combined on the
# driver, 64 rows here), (2) a broadcast stateless map emits codes. The
# quantization formula is an identically-parenthesized double expression in
# both engines, so codes are bit-exact vs the SQL mirror.
# ---------------------------------------------------------------------------


def embedding_quantize(sf_dir: str) -> rd.Dataset:
    """(vec_id, dim, code): code = floor((v-lo_d)/(hi_d-lo_d)*255 + 0.5),
    dim 1-based; constant dimensions quantize to 0."""
    import ray

    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])

    mm_schema = pa.schema([("dim", pa.int64()), ("lo", pa.float64()),
                           ("hi", pa.float64())])

    def partial_minmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mm_schema.empty_table()
        E = _embed_matrix(t)
        return pa.table({
            "dim": pa.array(np.arange(1, E.shape[1] + 1, dtype=np.int64)),
            "lo": pa.array(E.min(axis=0), pa.float64()),
            "hi": pa.array(E.max(axis=0), pa.float64()),
        })

    # combine the per-block (lo, hi) partials with a dim-keyed exchange so
    # the driver materializes exactly dims rows — combining raw partials
    # driver-side is blocks × dims, which at 10^6 blocks is a ~64M-row pull
    from ray.data.aggregate import Max, Min

    from ocrautomator_ray.functions.exchange import tune_exchange

    partials = ds.map_batches(partial_minmax, batch_format="pyarrow",
                              zero_copy_batch=True)
    tune_exchange(partials, 4)
    mm = (partials.groupby("dim", num_partitions=4)
          .aggregate(Min("lo", alias_name="lo"), Max("hi", alias_name="hi"))
          .to_pandas().sort_values("dim"))  # exactly dims rows
    lo = mm["lo"].to_numpy()
    hi = mm["hi"].to_numpy()
    ref = ray.put((lo, hi))

    def quantize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("vec_id", pa.int64()), ("dim", pa.int64()),
                              ("code", pa.int64())]).empty_table()
        lo_, hi_ = ray.get(ref)
        E = _embed_matrix(t)
        n, d = E.shape
        span = hi_ - lo_
        with np.errstate(divide="ignore", invalid="ignore"):
            code = np.floor((E - lo_) / span * 255 + 0.5)
        code = np.where(span > 0, code, 0.0).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n)),
            "code": pa.array(code.reshape(-1), pa.int64()),
        })

    return ds.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


SQL_EMBEDDING_QUANTIZE = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
mm AS (SELECT dim, MIN(v) AS lo, MAX(v) AS hi FROM e GROUP BY dim)
SELECT e.vec_id, CAST(e.dim AS BIGINT) AS dim,
       CASE WHEN hi > lo
            THEN CAST(FLOOR((e.v - lo) / (hi - lo) * 255 + 0.5) AS BIGINT)
            ELSE 0 END AS code
FROM e JOIN mm USING (dim)
"""


# ---------------------------------------------------------------------------
# semantic_dedup — SemDeDup-style semantic deduplication (Abbas et al. 2023,
# "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication"): within each cluster (the `label` column stands in for the
# k-means assignment SemDeDup computes; at real scale the persisted IVF
# index's `centroid` column is the same thing), vectors that are
# cosine-similar above a threshold are semantic duplicates, and the KEPT
# representative is the one FARTHEST from the cluster centroid (SemDeDup's
# low-centroid-similarity rule), ties toward the smaller vec_id.
#
# Drop rule (EXISTS-shaped, so it is deterministic and partition-invariant —
# no greedy sequential selection): a vector is dropped iff SOME same-label
# vector with cosine ≥ threshold has strictly higher priority, where
# priority = (larger exact-int dist² to centroid, then smaller vec_id).
#
# Distribution: centroids come from the label_centroids exchange (driver
# holds labels × dims ints, the classic small side); ONE label-keyed
# exchange co-locates each cluster, and the block computes its per-cluster
# cosine matrix with one float64 matmul + a triangular any() over the
# priority order. The partitioning assumption is SemDeDup's own: clusters
# are sized so a cluster's vectors fit one worker (SemDeDup uses ~100k
# clusters at 100M+ points precisely for this); a cluster too large for one
# block would use embedding_neardup's block-pair decomposition instead.
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = 0.4  # same verified regime as embedding_neardup


def semantic_dedup(sf_dir: str,
                   threshold: float = SEMDEDUP_THRESHOLD) -> rd.Dataset:
    """(vec_id, label, dist2, kept): kept=0 iff a same-label vector with
    cosine ≥ threshold dominates this one (farther from the label centroid
    in exact micro-int squared distance; ties → smaller vec_id wins)."""
    from ocrautomator_ray.functions.exchange import per_key_blocks, pruned_read

    labels_sorted, _, cmat = _label_centroid_matrix(sf_dir)

    out_schema = pa.schema([("vec_id", pa.int64()), ("label", pa.int64()),
                            ("dist2", pa.int64()), ("kept", pa.int64())])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        E = _embed_matrix(t)
        micros = np.floor(E * 1e6 + 0.5).astype(np.int64)
        diff = micros - cmat[np.searchsorted(labels_sorted, lab)]
        d2 = np.einsum("ij,ij->i", diff, diff)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        # priority order within each label: dist2 desc, vec_id asc
        order = np.lexsort((ids, -d2, lab))
        ls = lab[order]
        starts = np.nonzero(np.r_[True, ls[1:] != ls[:-1]])[0]
        ends = np.r_[starts[1:], len(ls)]
        kept = np.ones(len(ids), bool)
        for s, e in zip(starts, ends):  # loop over LABEL GROUPS, not rows
            sub = order[s:e]
            if len(sub) < 2:
                continue
            M = (En[sub] @ En[sub].T) >= threshold
            drop = np.tril(M, k=-1).any(axis=1)
            kept[sub[drop]] = False
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "label": pa.array(lab, pa.int64()),
            "dist2": pa.array(d2, pa.int64()),
            "kept": pa.array(kept.astype(np.int64), pa.int64()),
        })

    ds = pruned_read(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "label", "embedding"])
    return per_key_blocks(ds, ["label"], block, num_partitions=4)


SQL_SEMANTIC_DEDUP = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)*1000000 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
), cent AS (
  SELECT label, dim,
         CAST(FLOOR((2.0*SUM(v) + COUNT(*)) / (2*COUNT(*))) AS BIGINT) AS c
  FROM e GROUP BY label, dim
), d AS (
  SELECT e.vec_id, e.label,
         CAST(SUM((e.v - c.c)*(e.v - c.c)) AS BIGINT) AS dist2
  FROM e JOIN cent c ON e.label = c.label AND e.dim = c.dim
  GROUP BY e.vec_id, e.label
), dropped AS (
  SELECT DISTINCT a.vec_id
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
   AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[]))
       >= {SEMDEDUP_THRESHOLD}
  JOIN d da ON da.vec_id = a.vec_id
  JOIN d db ON db.vec_id = b.vec_id
  WHERE db.dist2 > da.dist2 OR (db.dist2 = da.dist2 AND b.vec_id < a.vec_id)
)
SELECT d.vec_id, d.label, d.dist2,
       CAST(CASE WHEN dropped.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
           AS kept
FROM d LEFT JOIN dropped ON d.vec_id = dropped.vec_id
"""


# ---------------------------------------------------------------------------
# knn_graph — exact within-label k-NN graph (the neighborhood structure that
# graph-based curation — SemDeDup cluster inspection, label-noise detection,
# density-based pruning — consumes downstream).  Distances are EXACT squared
# L2 over micro-int embeddings (ties toward the smaller neighbor vec_id), so
# ranking is deterministic and the SQL oracle hash-matches with no float
# ranking hazards.  One label-keyed exchange co-locates each label; a block
# computes its label runs' pairwise dist² with one int64 matmul per run.
# Scale shape: all-pairs WITHIN a label is quadratic in label size by
# definition — the partitioning assumption is label-bounded blocks (same
# contract as semantic_dedup).  At corpus scale swap the label key for IVF
# cell ids from ivf_index_build (probing n_probe cells per vector bounds the
# candidate set) — the exchange and block kernel are unchanged.
# ---------------------------------------------------------------------------

KNN_K = 5


def knn_graph(sf_dir: str, k: int = KNN_K) -> rd.Dataset:
    """(vec_id, label, nbr_rank, nbr_id, dist2): each vector's k nearest
    same-label neighbors by exact micro-int squared L2; singleton labels
    emit nothing (no neighbor exists)."""
    ds = pruned_read(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding", "label"])
    out_schema = pa.schema([
        ("vec_id", pa.int64()), ("label", pa.int64()),
        ("nbr_rank", pa.int64()), ("nbr_id", pa.int64()),
        ("dist2", pa.int64()),
    ])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        M = np.floor(_embed_matrix(t) * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((ids, lab))
        lab, ids, M = lab[order], ids[order], M[order]
        starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        ends = np.r_[starts[1:], len(lab)]
        o_vec, o_lab, o_rank, o_nbr, o_d2 = [], [], [], [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            X = M[s:e]
            nbr = ids[s:e]
            kk = min(k, n - 1)
            # int64 matmul has no BLAS path — float64 matmul is EXACT here:
            # with |micro| < 2^23 and dim 64 every partial dot sum is
            # < 64·2^46 = 2^52 < 2^53, an exactly-representable integer, so
            # truncating astype recovers the exact int64 product
            assert np.abs(X).max(initial=0) < (1 << 23), \
                "micro-int magnitude breaks float64-exact matmul bound"
            Xf = X.astype(np.float64)
            n2 = (X * X).sum(axis=1)
            # row-chunk the distance matrix: memory stays O(chunk·n), so a
            # hot label never materializes an n² block (the 100-TB contract)
            ch = max(256, (1 << 24) // max(n, 1))
            for c0 in range(0, n, ch):
                c1 = min(c0 + ch, n)
                G = (Xf[c0:c1] @ Xf.T).astype(np.int64)
                D = n2[c0:c1, None] + n2[None, :] - 2 * G
                D[np.arange(c0, c1) - c0, np.arange(c0, c1)] = \
                    np.iinfo(np.int64).max  # self excluded
                m = c1 - c0
                # kk smallest by D per row (ties arbitrary), then widen any
                # row whose boundary value is tied so nbr_id can tie-break
                P = np.argpartition(D, kk - 1, axis=1)[:, :kk]
                dk = np.take_along_axis(D, P, axis=1).max(axis=1)
                within = D <= dk[:, None]
                r_all = np.repeat(np.arange(m), within.sum(axis=1))
                c_all = np.nonzero(within)[1]
                # order candidates by (row, dist2, nbr_id), keep first kk/row
                order = np.lexsort((nbr[c_all], D[r_all, c_all], r_all))
                r_s, c_s = r_all[order], c_all[order]
                run_starts = np.flatnonzero(np.r_[True, r_s[1:] != r_s[:-1]])
                run_len = np.diff(np.r_[run_starts, len(r_s)])
                pos = np.arange(len(r_s)) - np.repeat(run_starts, run_len)
                keep = pos < kk
                r_k, c_k, pos_k = r_s[keep], c_s[keep], pos[keep]
                o_vec.append(ids[s + c0 + r_k])
                o_lab.append(lab[s + c0 + r_k])
                o_rank.append(pos_k + 1)
                o_nbr.append(nbr[c_k])
                o_d2.append(D[r_k, c_k])
        if not o_vec:
            return out_schema.empty_table()
        return pa.table({
            "vec_id": pa.array(np.concatenate(o_vec), pa.int64()),
            "label": pa.array(np.concatenate(o_lab), pa.int64()),
            "nbr_rank": pa.array(np.concatenate(o_rank), pa.int64()),
            "nbr_id": pa.array(np.concatenate(o_nbr), pa.int64()),
            "dist2": pa.array(np.concatenate(o_d2), pa.int64()),
        })

    return per_key_blocks(ds, ["label"], block, num_partitions=8)


SQL_KNN_GRAPH = f"""
WITH m AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> FLOOR(x*1000000 + 0.5)) AS mv
  FROM embeddings
), p AS (
  SELECT a.vec_id, a.label, b.vec_id AS nbr_id,
         CAST(list_inner_product(a.mv, a.mv)
            + list_inner_product(b.mv, b.mv)
            - 2*list_inner_product(a.mv, b.mv) AS BIGINT) AS dist2
  FROM m a JOIN m b ON a.label = b.label AND a.vec_id <> b.vec_id
)
SELECT vec_id, label,
       CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY dist2, nbr_id) AS BIGINT)
           AS nbr_rank,
       nbr_id, dist2
FROM p
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY dist2, nbr_id) <= {KNN_K}
"""


QUERIES = {
    "ann_topk": ann_topk,
    "knn_graph": knn_graph,
    "semantic_dedup": semantic_dedup,
    "hard_negatives": hard_negatives,
    "embedding_quantize": embedding_quantize,
    "embedding_outliers": embedding_outliers,
    "lsh_ann_topk": lsh_ann_topk,
    "ivf_ann_topk": ivf_ann_topk,
    "ivf_index_topk": ivf_index_topk,
    "label_centroids": label_centroids,
    "label_dispersion": label_dispersion,
}

SQL = {
    "label_dispersion": SQL_LABEL_DISPERSION,
    "ann_topk": SQL_ANN_TOPK,
    "knn_graph": SQL_KNN_GRAPH,
    "semantic_dedup": SQL_SEMANTIC_DEDUP,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "label_centroids": SQL_LABEL_CENTROIDS,
    "embedding_outliers": SQL_EMBEDDING_OUTLIERS,
    "embedding_quantize": SQL_EMBEDDING_QUANTIZE,
}
