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
- every other table is symlinked from the source (the oracle harness
  registers all ten views; only documents/embeddings feed the target
  queries).
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


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    nd = scale_documents(src, dst, k)
    ne = scale_embeddings(src, dst, k)
    for name in TABLES:
        if name in ("documents", "embeddings"):
            continue
        link = f"{dst}/{name}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{name}.parquet", link)
    print(f"{dst}: documents={nd} embeddings={ne} (K={k} from {src})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
