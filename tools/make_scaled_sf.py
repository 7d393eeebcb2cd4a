"""Deterministic K× scale-up of an sf dir's documents + embeddings tables,
for proving the shuffle-heavy operator family at the next order of magnitude
(VERDICT round-2 task #1). Test-data GENERATOR, driver-side and one-shot —
per-row Python here is fine; the engine under test never runs this code.

Usage:  python tools/make_scaled_sf.py [src_sf_dir] [dst_dir] [K]
        (defaults: /root/testdata/sf0.1  /tmp/sfbig  10)

Design (everything a pure function of (src bytes, K) — no wall clock, no
global RNG):

- documents: copy 0 is the source verbatim; copy k>0 shifts doc_id by k·N
  and salts every 3rd word with a (k, doc_id, position)-derived token, so
  cross-copy shingle Jaccard collapses (~0.2 of shingles survive → jac ≈
  0.1, far below the 0.5 MinHash threshold) and the candidate-pair count
  stays LINEAR in K instead of quadratic. Within each copy, dup structure is
  re-planted at a fixed rate: doc_id % 20 == 7 near-dups its predecessor
  (one word swapped, jac ≈ 0.87) and doc_id % 40 == 7 exact-dups it — so
  dedup output is non-trivial at every scale.
- embeddings: copy k>0 gets vec_id + k·M and v' = normalize(0.25·v + g_k)
  with g_k seeded per copy — correlation 0.25 < the 0.4 cosine threshold,
  so near-dup pairs stay at the ambient quadratic measure of the source
  distribution rather than exploding with systematic copy-of-origin pairs.
- events: copy k shifts event_id by k·N and user_id by k·(max_user+1) —
  per-user streams are byte-identical in shape, so no synthetic hot key is
  introduced and the window/session family scales to 10× users.
- orders/lineitem: the FACT tables scale 10× while the dimensions stay
  fixed (the realistic warehouse shape): o_orderkey / l_orderkey shift in
  lock-step by k·(max_orderkey+1) so the order⋈lineitem FK stays intact,
  and o_custkey / partkey / suppkey are left UNSHIFTED so dimension joins
  still land (each customer simply has 10× the orders).
- every other table is symlinked from the source.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def scale_documents(src: str, dst: str, k_copies: int) -> int:
    t = pq.read_table(f"{src}/documents.parquet")
    n = t.num_rows
    ids = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    srcs = t["source"].to_pylist()
    parts = [t]
    for k in range(1, k_copies):
        new_texts: list[str] = []
        for i, txt in enumerate(texts):
            d = int(ids[i])
            if d % 20 == 7 and i > 0:
                base = list(new_texts[i - 1].split())
                if d % 40 != 7 and base:  # near-dup: swap one word
                    base[len(base) // 2] = f"nd{k}d{d}"
                new_texts.append(" ".join(base))
            else:
                words = txt.split()
                for j in range(2, len(words), 3):
                    words[j] = f"s{k}d{d}w{j}"
                new_texts.append(" ".join(words))
        parts.append(pa.table({
            "doc_id": pa.array(ids + k * n, pa.int64()),
            "text": pa.array(new_texts, t.schema.field("text").type),
            "lang": pa.array(langs, t.schema.field("lang").type),
            "source": pa.array(srcs, t.schema.field("source").type),
            "n_chars": pa.array([len(s) for s in new_texts], pa.int64()),
        }).cast(t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/documents.parquet")
    return out.num_rows


def scale_embeddings(src: str, dst: str, k_copies: int) -> int:
    t = pq.read_table(f"{src}/embeddings.parquet")
    m = t.num_rows
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    labels = t["label"].to_numpy()
    ids = t["vec_id"].to_numpy()
    parts = [t]
    emb_type = t.schema.field("embedding").type
    for k in range(1, k_copies):
        g = np.random.default_rng(0xB16_000 + k).standard_normal(E.shape) / 8.0
        V = 0.25 * E + g
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        flat = V.astype(np.float32).reshape(-1)
        emb = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (m + 1) * E.shape[1], E.shape[1]),
                     pa.int32()),
            pa.array(flat, pa.float32())).cast(emb_type)
        parts.append(pa.table({
            "vec_id": pa.array(ids + k * m, pa.int64()),
            "embedding": emb,
            "label": pa.array(labels, t.schema.field("label").type),
        }).cast(t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/embeddings.parquet")
    return out.num_rows


def _shift_copies(src_path: str, dst_path: str, k_copies: int,
                  shifts: dict[str, int | None]) -> int:
    """Tile a table K×, shifting each column named in ``shifts`` by
    k·(its shift stride); stride None means k·(max+1) computed from data."""
    t = pq.read_table(src_path)
    parts = [t]
    strides = {c: (int(t[c].to_numpy(zero_copy_only=False).max()) + 1
                   if s is None else s) for c, s in shifts.items()}
    for k in range(1, k_copies):
        cols = {}
        for f in t.schema:
            col = t[f.name]
            if f.name in strides:
                arr = col.to_numpy(zero_copy_only=False) + k * strides[f.name]
                cols[f.name] = pa.array(arr, f.type)
            else:
                cols[f.name] = col
        parts.append(pa.table(cols).cast(t.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, dst_path)
    return out.num_rows


def scale_facts(src: str, dst: str, k_copies: int) -> dict[str, int]:
    n_ev = _shift_copies(f"{src}/events.parquet", f"{dst}/events.parquet",
                         k_copies, {"event_id": None, "user_id": None})
    okey = int(pq.read_table(f"{src}/orders.parquet", columns=["o_orderkey"])
               ["o_orderkey"].to_numpy().max()) + 1
    n_ord = _shift_copies(f"{src}/orders.parquet", f"{dst}/orders.parquet",
                          k_copies, {"o_orderkey": okey})
    n_li = _shift_copies(f"{src}/lineitem.parquet", f"{dst}/lineitem.parquet",
                         k_copies, {"l_orderkey": okey})
    return {"events": n_ev, "orders": n_ord, "lineitem": n_li}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    scaled = {"documents", "embeddings", "events", "orders", "lineitem"}
    for name in scaled:  # replace any symlink left by an earlier version
        p = f"{dst}/{name}.parquet"
        if os.path.islink(p):
            os.unlink(p)
    nd = scale_documents(src, dst, k)
    ne = scale_embeddings(src, dst, k)
    facts = scale_facts(src, dst, k)
    for name in TABLES:
        if name in scaled:
            continue
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)
    print(f"{dst}: documents={nd} embeddings={ne} {facts} (K={k} from {src})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
