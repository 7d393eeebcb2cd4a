"""Distributed linear-classifier training: batch perceptron over hashed
document features (the quality/language-screen trainer).

Production curation pipelines train a cheap linear classifier over the
corpus (fastText-style language/quality screens); this module implements
the training loop itself as a Ray Data iteration — full-batch perceptron,
chosen because its update rule is INTEGER (w ← w + Σ_misclassified y·x),
so the trained weights are bit-identical on any partitioning and in the
SQL mirror, unlike SGD/logistic whose float exp/ordering would not be.

Features are the signed hashed-token-count vectors of ``hashed_doc_vectors``
(functions/mix.py — Weinberger et al., ICML 2009) plus a constant bias
dim; the label is +1 for ``lang = 'en'`` rows, −1 otherwise.

Per round, one streaming pass over the documents table re-featurizes each
block (hashing is cheap relative to the read — the kmeans-style choice of
re-reading per round over materializing a doc-count-sized feature table),
scores it against the broadcast weight vector, and emits ONE partial row
per dim: Σ y·x over that block's misclassified rows plus the block's error
count. One tiny dim-keyed exchange (17 × blocks rows) reduces the partials;
the driver folds O(dim) state into the next round's closure — exactly the
kmeans/pagerank bounded-driver-state discipline.

Overflow: |x_j| ≤ doc token count (~10²), so |w_j| grows ≤ corpus token
mass per round — int64-safe through every tested scale (10× sweep: ~3e6);
the SQL mirror accumulates in HUGEINT, and at 10^12-doc scale the engine
partial would widen to a (hi, lo) pair through the same exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read, tune_exchange
from ocrautomator_ray.functions.mix import (
    _HASH_SIGN_SHIFT,
    HASH_DIM,
    SQL_HASHED_DOC_VECTORS,
)

PCT_ROUNDS = 3
PCT_DIM = HASH_DIM + 1      # hashed feature dims + constant bias


def _featurize(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """((n, PCT_DIM) int64 feature matrix with trailing bias column,
    (n,) ±1 labels) — the hashed_doc_vectors kernel plus y = lang=='en'."""
    from ocrautomator_ray.functions.dedup import _fnv1a_strings, _tokenize_re2

    flat, cnt = _tokenize_re2(t["text"])
    n = t.num_rows
    X = np.zeros((n, PCT_DIM), np.int64)
    X[:, HASH_DIM] = 1
    if len(flat):
        h = _fnv1a_strings(flat)
        bucket = (h % np.uint64(HASH_DIM)).astype(np.int64)
        sign = np.where(
            (h >> np.uint64(_HASH_SIGN_SHIFT)) & np.uint64(1) == 1,
            -1, 1).astype(np.int64)
        np.add.at(X, (np.repeat(np.arange(n), cnt), bucket), sign)
    lang = t["lang"].to_pandas().to_numpy()
    y = np.where(lang == "en", 1, -1).astype(np.int64)
    return X, y


def _train(sf_dir: str, rounds: int,
           checkpoint_dir: str | None = None) -> tuple[np.ndarray, int]:
    """((PCT_DIM,) int64 final weights, misclassified count in the last
    round — i.e. under the weights that round started from).

    ``checkpoint_dir``: per-round weight checkpoints (state/rounds.py) — a
    killed driver resumes the batch-perceptron loop from its last committed
    round instead of round 0."""
    from ray.data.aggregate import Sum

    from ocrautomator_ray.state.rounds import RoundState, input_fingerprint

    partial_schema = pa.schema([
        ("dim", pa.int64()), ("delta", pa.int64()), ("errors", pa.int64()),
    ])
    dims = np.arange(PCT_DIM, dtype=np.int64)
    w = np.zeros(PCT_DIM, dtype=np.int64)
    errors = 0
    start_round = 0
    rs = None
    if checkpoint_dir is not None:
        rs = RoundState(checkpoint_dir, input_fingerprint(
            f"{sf_dir}/documents.parquet", rounds=rounds))
        start_round, state = rs.resume()
        if state is not None:
            w, errors = state["w"], int(state["errors"])
    for rnd in range(start_round, rounds):
        def round_partial(t: pa.Table, w=w) -> pa.Table:
            if t.num_rows == 0:
                return partial_schema.empty_table()
            X, y = _featurize(t)
            mis = y * (X @ w) <= 0
            delta = (X[mis] * y[mis, None]).sum(axis=0, dtype=np.int64)
            return pa.table({
                "dim": pa.array(dims, pa.int64()),
                "delta": pa.array(delta, pa.int64()),
                "errors": pa.array(
                    np.full(PCT_DIM, int(mis.sum()), np.int64), pa.int64()),
            })

        ds = pruned_read(f"{sf_dir}/documents.parquet",
                         ["doc_id", "text", "lang"])
        out = ds.map_batches(round_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
        tune_exchange(out)
        agg = (out.groupby("dim", num_partitions=4)
                  .aggregate(Sum("delta", alias_name="delta"),
                             Sum("errors", alias_name="errors"))
                  .to_pandas().sort_values("dim"))
        w = w + agg["delta"].to_numpy(dtype=np.int64)
        errors = int(agg["errors"].iloc[0])   # every dim row carries the total
        if rs is not None:
            rs.commit(rnd, w=w, errors=np.int64(errors))
    return w, errors


def perceptron_lang(sf_dir: str, rounds: int = PCT_ROUNDS,
                    checkpoint_dir: str | None = None) -> rd.Dataset:
    """(dim, weight, errors): the trained weight vector (dim = PCT_DIM-1 is
    the bias) and the misclassified-document count of the final round."""
    w, errors = _train(sf_dir, rounds, checkpoint_dir=checkpoint_dir)
    return rd.from_arrow(pa.table({
        "dim": pa.array(np.arange(PCT_DIM, dtype=np.int64), pa.int64()),
        "weight": pa.array(w, pa.int64()),
        "errors": pa.array(np.full(PCT_DIM, errors, np.int64), pa.int64()),
    }))


def _sql_perceptron(rounds: int = PCT_ROUNDS) -> str:
    """Unrolled perceptron rounds in long format over the
    hashed_doc_vectors mirror (nested as a subquery CTE)."""
    vlist = ", ".join(f"f.v_{j}" for j in range(HASH_DIM)) + ", 1"
    parts = [f"""
WITH featl AS (
    SELECT f.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE -1 END AS y,
           generate_subscripts(list_value({vlist}), 1) - 1 AS dim,
           CAST(unnest(list_value({vlist})) AS HUGEINT) AS x
    FROM ({SQL_HASHED_DOC_VECTORS}) f JOIN documents d USING (doc_id)
),
w0 AS (SELECT CAST(range AS BIGINT) AS dim, CAST(0 AS HUGEINT) AS w
       FROM range({PCT_DIM}))"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
m{i} AS (
    SELECT doc_id, y, y * SUM(x * w.w) AS marg
    FROM featl JOIN w{i - 1} w USING (dim) GROUP BY doc_id, y
),
w{i} AS (
    SELECT w.dim, w.w + COALESCE(u.delta, 0) AS w
    FROM w{i - 1} w LEFT JOIN (
        SELECT f.dim, SUM(f.y * f.x) AS delta
        FROM featl f JOIN m{i} m USING (doc_id)
        WHERE m.marg <= 0
        GROUP BY f.dim) u USING (dim)
)""")
    parts.append(f"""
SELECT w.dim, CAST(w.w AS BIGINT) AS weight,
       (SELECT COUNT(*) FROM m{rounds} WHERE marg <= 0) AS errors
FROM w{rounds} w
""")
    return "".join(parts)


SQL_PERCEPTRON_LANG = _sql_perceptron()


QUERIES = {
    "perceptron_lang": perceptron_lang,
}

SQL = {
    "perceptron_lang": SQL_PERCEPTRON_LANG,
}
