"""Deduplication operators for training-data pipelines (SURVEY extension
mandated by the driver): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (tested at sf≤0.1, shaped for 100 TB):
- exact dedup: vectorized content hash in map_batches + per-batch partial
  min, then one small groupby — the shuffle moves (hash, min_id) pairs, not
  text;
- MinHash/SimHash: signatures are computed batch-local (numpy, one pass),
  candidates come from a banded groupby (shuffle moves 16-byte band keys),
  verification joins the candidate pairs back to signatures via an in-object-
  store broadcast at test scale — at real scale that broadcast becomes a
  hash-partitioned join on doc_id (both sides large);
- all pair outputs are (doc_a < doc_b) and deduplicated, so results are
  deterministic under any execution order.

MinHash/LSH per Broder '97 / Leskovec-Rajaraman-Ullman MMDS ch.3; SimHash per
Charikar '02.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# ---------------------------------------------------------------------------
# shared shingle / signature kernels (seeded, deterministic)
# ---------------------------------------------------------------------------

def _per_key_runs(ds: rd.Dataset, keys: list[str], fn, empty_schema: pa.Schema,
                  num_partitions: int = 16) -> rd.Dataset:
    """Apply fn to each complete key-group, via the streaming hash exchange.

    Equivalent to groupby(keys).map_groups(fn) but ~an order of magnitude
    faster for many small groups: one hash repartition co-locates and sorts
    the keys, then a single vectorized map_batches splits each block into key
    runs (same pattern as the pipeline's reassembly commit). Falls back to
    groupby().map_groups on Ray versions without HASH_SHUFFLE.

    Group-completeness invariant: a key run must never straddle two blocks.
    Ray 2.49's hash-shuffle finalize emits exactly ONE block per partition
    (hash_shuffle.py ``finalize`` yields a single block; splitting to
    target_max_block_size is an unimplemented TODO there), which is the same
    guarantee Ray's own ``GroupedData.map_groups`` relies on — see
    grouped_data.py ("batch contains the entire block, guaranteeing that
    groups are contained in full"). tests/test_dedup.py pins this with an
    oversized-partition fixture so a future Ray that implements the TODO
    fails loudly instead of silently dropping cross-fragment pairs.
    """
    def per_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return empty_schema.empty_table()
        # self-sort: the exchange co-locates but does not order (sort=False —
        # the aggregator-side sort crashes on schemaless shards from empty
        # upstream blocks in Ray 2.49; see exchange.per_key_blocks)
        arrs = [block[k].to_numpy(zero_copy_only=False) for k in keys]
        order = np.lexsort(arrs[::-1])
        block = block.take(pa.array(order))
        arrs = [a[order] for a in arrs]
        n = len(arrs[0])
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for a in arrs:
            change[1:] |= a[1:] != a[:-1]
        bounds = np.nonzero(change)[0].tolist() + [n]
        outs = [fn(block.slice(s, e - s)) for s, e in zip(bounds[:-1], bounds[1:])]
        return pa.concat_tables(outs) if outs else empty_schema.empty_table()

    try:
        from ocrautomator_ray.functions.exchange import per_key_blocks

        return per_key_blocks(ds, keys, per_block,
                              num_partitions=num_partitions)
    except ImportError:  # pre-HASH_SHUFFLE Ray: portable sort-based fallback
        return ds.groupby(keys).map_groups(fn, batch_format="pyarrow")


from ocrautomator_ray.functions.exchange import (
    per_key_blocks,
    pruned_read,
    auto_partitions as _auto_partitions,
    tune_exchange as _tune_exchange,
)

_MERSENNE = np.uint64((1 << 61) - 1)
_NUM_HASHES = 64
_BANDS = 16
_ROWS_PER_BAND = _NUM_HASHES // _BANDS

_rng = np.random.default_rng(0xC0FFEE)  # module-load deterministic (PCG64)
_A = _rng.integers(1, _MERSENNE, size=_NUM_HASHES, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=_NUM_HASHES, dtype=np.uint64)

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


_FNV_PRIME_INT = 1099511628211
_FNV_OFFSET_INT = 14695981039346656037
_U64_MASK = (1 << 64) - 1


_PAIR_CHUNK = 1 << 22  # ≤4M index pairs (~64 MB of int64) per yielded chunk


def _bucket_pair_indices(bid: np.ndarray, key: np.ndarray):
    """Yield (ia, ib) ORIGINAL-row index arrays for every in-bucket pair of
    every (band_id, band_key) run in a block — vectorized across runs by
    stacking equal-size buckets into one (groups, size) matrix and emitting
    all C(s,2) pairs with a single triu gather (no per-bucket Python loop;
    per-run dispatch measured ~1.7 s/task where this takes ~30 ms). Callers
    map the indices to ids/payloads and must drop self-pairs from duplicate
    doc_id rows.

    Skew guard: a degenerate corpus (thousands of near-identical docs sharing
    one band key) makes C(s,2) quadratic — emission is therefore CHUNKED at
    ~_PAIR_CHUNK pairs per yield (across the group axis, and across triu row
    ranges inside a single hot bucket), bounding peak memory regardless of
    bucket size while still emitting every pair (lossless, unlike
    fingerprint_dups' FP_PAIR_CAP drop, because MinHash verify needs every
    candidate)."""
    order = np.lexsort((key, bid))
    b_s, k_s = bid[order], key[order]
    n = len(order)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    change[1:] = (b_s[1:] != b_s[:-1]) | (k_s[1:] != k_s[:-1])
    run = np.cumsum(change) - 1
    sizes = np.bincount(run)
    starts = np.zeros(len(sizes) + 1, np.int64)
    np.cumsum(sizes, out=starts[1:])
    for s in np.unique(sizes):
        if s < 2:
            continue
        s = int(s)
        g = np.nonzero(sizes == s)[0]
        pairs_per_group = s * (s - 1) // 2
        if pairs_per_group <= _PAIR_CHUNK:
            ia, ib = np.triu_indices(s, k=1)
            gpc = max(1, _PAIR_CHUNK // pairs_per_group)  # groups per chunk
            for g0 in range(0, len(g), gpc):
                sel = order[starts[g[g0:g0 + gpc]][:, None]
                            + np.arange(s)[None, :]]
                yield sel[:, ia].ravel(), sel[:, ib].ravel()
        else:
            # hot bucket: chunk the triangular index generation by row range
            for grp in g:
                base = order[starts[grp] + np.arange(s)]
                i = 0
                while i < s - 1:
                    # rows i..j-1 such that their pair count stays ≤ chunk
                    cnt = np.cumsum(s - 1 - np.arange(i, s - 1))
                    j = i + max(1, int(np.searchsorted(cnt, _PAIR_CHUNK,
                                                       side="right")))
                    rows = np.arange(i, j)
                    reps = s - 1 - rows
                    ia = np.repeat(rows, reps)
                    ib = np.repeat(rows + 1, reps) + _ramp(reps)
                    yield base[ia], base[ib]
                    i = j


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """FNV-1a over tokens → uint64 array.

    Pure-int inner loop (identical values to uint64 wrap-around arithmetic,
    ~10× faster than numpy-scalar ops and no overflow warnings).
    """
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = _FNV_OFFSET_INT
        for b in tok.encode():
            h = ((h ^ b) * _FNV_PRIME_INT) & _U64_MASK
        out[i] = h
    return out


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct hashed word k-shingles of a document (scalar reference;
    the pipeline uses the value-identical vectorized _batch_shingles)."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(_hash_tokens(grams)) if grams else np.empty(0, dtype=np.uint64)


# -- vectorized batch kernels (value-identical to the scalar references) ----

def _fnv1a_strings(arr) -> np.ndarray:
    """FNV-1a of every element of a string array, vectorized.

    Loops over byte *positions* (bounded by the longest element), with one
    numpy gather + mix per position over all still-active elements — no
    per-element Python loop. Identical values to _hash_tokens.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0:
        return out
    off_dt = np.int64 if pa.types.is_large_string(arr.type) or \
        pa.types.is_large_binary(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[arr.offset: arr.offset + n + 1] \
        .astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    with np.errstate(over="ignore"):
        for p in range(int(lens.max()) if n else 0):
            act = np.nonzero(lens > p)[0]
            b = data[starts[act] + p].astype(np.uint64)
            out[act] = (out[act] ^ b) * _FNV_PRIME
    return out


def _tokenize_batch(texts) -> tuple[pa.Array, np.ndarray]:
    """(flat lowercase words, per-doc word counts) for a string column;
    token sequence per doc equals ``text.lower().split()`` (Arrow whitespace
    split, empty tokens dropped)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    import pyarrow.compute as pc

    low = pc.utf8_lower(pc.fill_null(texts, ""))
    return _split_tokens(pc.utf8_split_whitespace(low), len(low))


def _split_tokens(words, n_docs: int) -> tuple[pa.Array, np.ndarray]:
    """(flat tokens, per-doc counts) from a list<string> split result, empty
    tokens dropped."""
    import pyarrow.compute as pc

    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nonempty = pc.greater(pc.binary_length(flat), 0)
    ne = nonempty.to_numpy(zero_copy_only=False)
    if not ne.all():
        docidx = np.repeat(np.arange(len(counts)), counts)
        flat = flat.filter(nonempty)
        counts = np.bincount(docidx[ne], minlength=n_docs).astype(np.int64)
    return flat, counts


def _tokenize_re2(texts) -> tuple[pa.Array, np.ndarray]:
    """(flat lowercase words, per-doc counts) splitting on the RE2 class
    ``\\s+`` — byte-identical to DuckDB's
    ``list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')``
    (both engines run RE2, where ``\\s`` is ASCII-only). Use this tokenizer
    in every operator whose SQL oracle tokenizes with that expression;
    ``_tokenize_batch`` (Unicode whitespace, equals Python ``str.split``)
    differs on e.g. NBSP and is the right reference for the
    pytest-oracled MinHash/SimHash kernels instead."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    return _split_tokens(pc.split_pattern_regex(low, pattern=r"\s+"), len(low))


def _ramp(group_sizes: np.ndarray) -> np.ndarray:
    """[0..g0), [0..g1), ... concatenated (within-group offsets)."""
    total = int(group_sizes.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    excl = np.zeros(len(group_sizes), dtype=np.int64)
    np.cumsum(group_sizes[:-1], out=excl[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(excl, group_sizes)


def _batch_shingles(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """(flat distinct shingle hashes, per-doc counts); each doc's slice equals
    word_shingles(text) exactly (sorted distinct FNV of word k-grams)."""
    import pyarrow.compute as pc

    flat, counts = _tokenize_batch(texts)
    n = len(counts)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(0, np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=offs[1:])
    gram_doc, gram_hash = [], []
    reg = np.nonzero(counts >= k)[0]
    if reg.size:
        gc = counts[reg] - k + 1
        gstart = np.repeat(offs[reg], gc) + _ramp(gc)
        cols = [flat.take(pa.array(gstart + j)) for j in range(k)]
        grams = pc.binary_join_element_wise(*cols, " ")
        gram_hash.append(_fnv1a_strings(grams))
        gram_doc.append(np.repeat(reg, gc))
    short = np.nonzero((counts > 0) & (counts < k))[0]
    if short.size:  # <k words: one gram joining all words (rare; scalar path)
        joined = [" ".join(flat.slice(offs[d], counts[d]).to_pylist())
                  for d in short]
        gram_hash.append(_hash_tokens(joined))
        gram_doc.append(short.astype(np.int64))
    if not gram_hash:
        return np.empty(0, np.uint64), np.zeros(n, np.int64)
    gh = np.concatenate(gram_hash)
    gd = np.concatenate(gram_doc)
    order = np.lexsort((gh, gd))
    gh, gd = gh[order], gd[order]
    keep = np.ones(len(gh), dtype=bool)
    keep[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
    return gh[keep], np.bincount(gd[keep], minlength=n).astype(np.int64)


def _batch_signatures(flat_sh: np.ndarray, sh_counts: np.ndarray) -> np.ndarray:
    """(n_docs, 64) MinHash signatures from flattened shingles; row i equals
    minhash_signature(shingles of doc i) (empty docs get the sentinel row).

    Iterates over the 64 hash functions with ONE shingle-sized buffer
    (reused via ``out=``) instead of materializing the (64 × n_shingles)
    matrix: the matrix costs three 64 MB temporaries per chunk whose
    first-touch page faults dominate under memory pressure (measured 11 s
    cold vs 0.02 s warm for the same multiply), while the per-hash loop's
    working set is a few MB and the 64 reduceat passes are C-speed."""
    n = len(sh_counts)
    sigs = np.full((n, _NUM_HASHES), _MERSENNE, dtype=np.uint64)
    if flat_sh.size == 0:
        return sigs
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(sh_counts, out=starts[1:])
    docs = np.nonzero(sh_counts > 0)[0]
    if docs.size == 0:
        return sigs
    idx = starts[docs]
    hv = np.empty(flat_sh.size, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for h in range(_NUM_HASHES):
            np.multiply(flat_sh, _A[h], out=hv)
            np.add(hv, _B[h], out=hv)
            np.mod(hv, _MERSENNE, out=hv)
            sigs[docs, h] = np.minimum.reduceat(hv, idx)
    return sigs


def _batch_band_keys(sigs: np.ndarray) -> np.ndarray:
    """(n_docs, BANDS) band bucket keys; row i equals band_keys(sigs[i])."""
    b = sigs.reshape(len(sigs), _BANDS, _ROWS_PER_BAND)
    key = np.full((len(sigs), _BANDS), _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(_ROWS_PER_BAND):
            key = (key ^ b[:, :, r]) * _FNV_PRIME
    return key


def _batch_simhash(texts) -> np.ndarray:
    """uint64 SimHash per doc; element i equals simhash64(texts[i])."""
    flat, counts = _tokenize_batch(texts)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat) == 0:
        return out
    hv = _fnv1a_strings(flat)
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    docs = np.nonzero(counts > 0)[0]
    if docs.size == 0:
        return out
    idx = starts[docs]
    # per-bit loop with one token-sized buffer (reused via out=), not the
    # (tokens × 64) matrix — same first-touch-page-fault hazard as
    # _batch_signatures (three ~64 MB temporaries per chunk, 11 s cold)
    bit = np.empty(hv.size, dtype=np.uint64)
    dcounts = counts[docs]
    for b in range(64):
        np.right_shift(hv, np.uint64(b), out=bit)
        np.bitwise_and(bit, np.uint64(1), out=bit)
        ones = np.add.reduceat(bit, idx)
        out[docs] |= (ones * 2 > dcounts).astype(np.uint64) << np.uint64(b)
    return out


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """64-permutation MinHash signature ((a*x+b) mod 2^61-1, universal family)."""
    if len(shingles) == 0:
        return np.full(_NUM_HASHES, _MERSENNE, dtype=np.uint64)
    with np.errstate(over="ignore"):
        hv = (_A[:, None] * shingles[None, :] + _B[:, None]) % _MERSENNE
    return hv.min(axis=1)


def band_keys(sig: np.ndarray) -> np.ndarray:
    """Collapse each band of the signature to one uint64 bucket key."""
    bands = sig.reshape(_BANDS, _ROWS_PER_BAND)
    with np.errstate(over="ignore"):
        key = _FNV_OFFSET * np.ones(_BANDS, dtype=np.uint64)
        for r in range(_ROWS_PER_BAND):
            key = (key ^ bands[:, r]) * _FNV_PRIME
    return key


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> np.uint64:
    """Charikar SimHash over word unigrams (count-weighted bit majority)."""
    words = text.lower().split()
    if not words:
        return np.uint64(0)
    hv = _hash_tokens(words)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    counts = bits.astype(np.int64).sum(axis=0)
    maj = (counts * 2 > len(words)).astype(np.uint64)
    return np.uint64((maj << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


# ---------------------------------------------------------------------------
# minhash_lsh_dups — near-duplicate pairs over documents.text
# ---------------------------------------------------------------------------

MINHASH_THRESHOLD = 0.5


def _shingle_blob_col(flat_sh: np.ndarray, sh_counts: np.ndarray) -> pa.Array:
    """Pack per-doc uint64 shingle slices into a large_binary column
    (zero-copy: one offsets buffer + the flat hash buffer). Binary, not
    list<uint64>, because Arrow's hash join rejects list payload columns."""
    offs = np.zeros(len(sh_counts) + 1, np.int64)
    np.cumsum(sh_counts * 8, out=offs[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(sh_counts),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat_sh.tobytes())])


def _decode_shingle_blobs(col) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of _shingle_blob_col: (flat uint64 hashes, per-row counts)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64), np.zeros(0, np.int64)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int64)[arr.offset: arr.offset + n + 1]
    flat = np.frombuffer(bufs[2], dtype=np.uint64, offset=int(offs[0]),
                         count=int((offs[-1] - offs[0]) // 8))
    return flat, (offs[1:] - offs[:-1]) // 8


def minhash_lsh_dups(sf_dir: str, threshold: float = MINHASH_THRESHOLD,
                     pair_keep=None, emit_counts: bool = False,
                     emit_sizes: bool = False) -> rd.Dataset:
    """Candidate pairs via banded MinHash-LSH, verified with true Jaccard.

    ``pair_keep`` (optional): vectorized predicate ``(doc_a, doc_b) ->
    bool mask`` applied to candidate pairs BEFORE the two verify exchanges —
    callers that can rule a pair out from the ids alone (e.g. the
    cross-snapshot dedup in snapshot.py, which skips committed×committed
    pairs) prune the shuffle volume at the source. Default None keeps every
    candidate (the behavior every existing caller and oracle pins).

    Pipeline: the (doc_id, shingles-blob) table is derived from the read by
    vectorized kernels (~30 µs/doc) in each of its two consumer branches —
    two fully-pipelined streaming passes beat a materialize barrier at this
    cost; at 10^12-doc scale the table would instead be checkpointed once
    via write_parquet and re-read. Signatures/band keys feed the band-bucket
    exchange → within-bucket candidate pairs. Verification is fully
    distributed (no driver-side materialization, no whole-table broadcast)
    via two hash exchanges: (1) pair rows tagged by each end doc are
    co-partitioned with the shingle table on doc_id — deduping candidates
    and attaching that end's shingles in one pass (the shingle table moves
    through the shuffle exactly once); (2) the two halves of each pair are
    co-partitioned on (doc_a, doc_b) and true Jaccard is computed. Repartition
    exchanges are used instead of Dataset.join/HashAggregate ops: same
    hash-partitioned semantics, roughly half the fixed operator latency and
    half the shuffle volume (a pair⋈table join per end would move the table
    twice). Output: (doc_a, doc_b, jaccard).
    """
    # the exchanged payload is the SHINGLE table (~8× the compressed text
    # bytes — 64-bit hash per word), not the text: size partitions for the
    # blow-up or the verify blocks go quadratic-ish single-threaded at 100×
    # (39 s → 21 s at 500k docs), same sizing rationale as decontaminate
    n_parts = _auto_partitions(f"{sf_dir}/documents.parquet",
                               bytes_per_partition=8 << 20)
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])
    _tune_exchange(ds, n_parts)  # budget the joins below before the plan is built

    def shingle_rows(t: pa.Table) -> pa.Table:
        flat, cnt = _batch_shingles(t["text"])
        return pa.table({
            "doc_id": t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
            "shingles": _shingle_blob_col(flat, cnt),
        })

    sh_ds = ds.map_batches(shingle_rows, batch_format="pyarrow",
                           zero_copy_batch=True)

    band_rows = sh_ds.map_batches(sig_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return verified_pair_stage(sh_ds, band_rows, n_parts, threshold,
                               pair_keep=pair_keep, emit_counts=emit_counts,
                               emit_sizes=emit_sizes)


def sig_rows(t: pa.Table) -> pa.Table:
    """(doc_id, band_id, band_key) rows from a (doc_id, shingles) table —
    the melt the band-bucket exchange consumes."""
    flat, cnt = _decode_shingle_blobs(t["shingles"])
    keys = _batch_band_keys(_batch_signatures(flat, cnt))
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": pa.array(np.repeat(ids, _BANDS), pa.int64()),
        "band_id": pa.array(np.tile(np.arange(_BANDS, dtype=np.int32), len(ids)), pa.int32()),
        "band_key": pa.array(keys.reshape(-1), pa.uint64()),
    })


def verified_pair_stage(sh_ds: rd.Dataset, band_rows: rd.Dataset,
                        n_parts: int, threshold: float,
                        pair_keep=None, emit_counts: bool = False,
                        emit_sizes: bool = False) -> rd.Dataset:
    """The candidate→verify tail of banded MinHash-LSH, shared by
    ``minhash_lsh_dups`` (both sides computed in-pipeline) and the persisted
    signature index (snapshot.incremental_neardup_indexed, committed side
    READ from disk): band-bucket exchange → within-bucket candidate pairs
    (``pair_keep``-pruned) → shingle-attach exchange → pair-verify exchange.
    ``sh_ds`` must hold each doc_id exactly once with its shingle blob;
    ``band_rows`` holds its (doc_id, band_id, band_key) melt.
    ``emit_counts=True`` outputs the exact integer (inter, uni) set sizes
    instead of the float jaccard — the threshold-tuning consumers
    (neardup_jaccard_hist) bucket on integers to dodge float boundaries."""
    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def pairs_block(block: pa.Table) -> pa.Table:
        """All candidate pairs of every (band_id, band_key) run in the
        block, via the shared size-stacked triu kernel."""
        if block.num_rows == 0:
            return pair_schema.empty_table()
        bid = block["band_id"].to_numpy(zero_copy_only=False)
        key = block["band_key"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        for ia, ib in _bucket_pair_indices(bid, key):
            A, B = ids[ia], ids[ib]
            nz = A != B  # duplicate doc_id rows must not yield self-pairs
            lo, hi = np.minimum(A[nz], B[nz]), np.maximum(A[nz], B[nz])
            if pair_keep is not None:
                m = pair_keep(lo, hi)
                lo, hi = lo[m], hi[m]
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pair_schema.empty_table()
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
        })

    pairs = (  # duplicates across bands — deduped in the attach stage below
        band_rows.repartition(n_parts, keys=["band_id", "band_key"])
        .map_batches(pairs_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )

    # -- exchange 1: co-partition pair end-rows with the shingle table -------
    def pair_end_rows(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        n = len(a)
        return pa.table({
            "key": pa.array(np.concatenate([a, b]), pa.int64()),
            "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
            "shingles": pa.nulls(2 * n, pa.large_binary()),
        })

    def sh_tagged_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        neg = pa.array(np.full(n, -1, np.int64), pa.int64())
        return pa.table({"key": t["doc_id"], "doc_a": neg, "doc_b": neg,
                         "shingles": t["shingles"]})

    both = pairs.map_batches(pair_end_rows, batch_format="pyarrow",
                             zero_copy_batch=True).union(
        sh_ds.map_batches(sh_tagged_rows, batch_format="pyarrow",
                          zero_copy_batch=True))

    half_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                             ("shingles", pa.large_binary())])

    def attach_block(block: pa.Table) -> pa.Table:
        """Block holds ALL rows for each of its keys (sorted by key): dedup
        each key's pair end-rows, attach the key's shingle blob to each."""
        if block.num_rows == 0:
            return half_schema.empty_table()
        key = block["key"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")  # exchange no longer pre-sorts
        block = block.take(pa.array(order))
        key = key[order]
        da = block["doc_a"].to_numpy(zero_copy_only=False)
        db = block["doc_b"].to_numpy(zero_copy_only=False)
        is_sh = da < 0
        sh_keys = key[is_sh]
        pk, pda, pdb = key[~is_sh], da[~is_sh], db[~is_sh]
        order = np.lexsort((pdb, pda, pk))
        pk, pda, pdb = pk[order], pda[order], pdb[order]
        uniq = np.ones(len(pk), dtype=bool)
        uniq[1:] = (pk[1:] != pk[:-1]) | (pda[1:] != pda[:-1]) | (pdb[1:] != pdb[:-1])
        pk, pda, pdb = pk[uniq], pda[uniq], pdb[uniq]
        pos = np.searchsorted(sh_keys, pk)
        if not (pos < len(sh_keys)).all() or not (sh_keys[np.minimum(pos, len(sh_keys) - 1)] == pk).all():
            raise RuntimeError("pair end-row co-located without its shingle row "
                               "(hash-exchange co-partitioning violated)")
        sh_idx = np.nonzero(is_sh)[0][pos]
        blobs = block["shingles"].combine_chunks().take(pa.array(sh_idx))
        return pa.table({"doc_a": pa.array(pda, pa.int64()),
                         "doc_b": pa.array(pdb, pa.int64()),
                         "shingles": blobs})

    halves = (
        both.repartition(n_parts, keys=["key"])
        .map_batches(attach_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )

    # -- exchange 2: co-partition the two halves of each pair, verify --------
    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("inter", pa.int64()),
         ("smin", pa.int64()), ("smax", pa.int64())] if emit_sizes else
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("inter", pa.int64()), ("uni", pa.int64())] if emit_counts else
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("jaccard", pa.float64())])

    def judge_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        da = block["doc_a"].to_numpy(zero_copy_only=False)
        db = block["doc_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((db, da))  # exchange no longer pre-sorts
        block = block.take(pa.array(order))
        da, db = da[order], db[order]
        if len(da) % 2 or not (da[0::2] == da[1::2]).all() \
                or not (db[0::2] == db[1::2]).all():
            raise RuntimeError("pair halves not co-located in one block "
                               "(hash-exchange co-partitioning violated)")
        flat, cnt = _decode_shingle_blobs(block["shingles"])
        s = np.zeros(len(cnt) + 1, np.int64)
        np.cumsum(cnt, out=s[1:])
        inter = np.array([
            np.intersect1d(flat[s[2 * i]: s[2 * i + 1]],
                           flat[s[2 * i + 1]: s[2 * i + 2]],
                           assume_unique=True).size
            for i in range(len(da) // 2)
        ], np.int64)
        uni = cnt[0::2] + cnt[1::2] - inter
        jac = np.divide(inter, uni, out=np.ones(len(inter), np.float64),
                        where=uni > 0)  # uni == 0 → 1.0, same as jaccard()
        keep = jac >= threshold
        if emit_sizes:
            # the two halves of a pair land in exchange order, so per-SIDE
            # sizes aren't attributable — emit the symmetric (min, max)
            # set sizes, which containment consumes
            smin = np.minimum(cnt[0::2], cnt[1::2]).astype(np.int64)
            smax = np.maximum(cnt[0::2], cnt[1::2]).astype(np.int64)
            return pa.table({"doc_a": pa.array(da[0::2][keep], pa.int64()),
                             "doc_b": pa.array(db[0::2][keep], pa.int64()),
                             "inter": pa.array(inter[keep], pa.int64()),
                             "smin": pa.array(smin[keep], pa.int64()),
                             "smax": pa.array(smax[keep], pa.int64())})
        if emit_counts:
            return pa.table({"doc_a": pa.array(da[0::2][keep], pa.int64()),
                             "doc_b": pa.array(db[0::2][keep], pa.int64()),
                             "inter": pa.array(inter[keep], pa.int64()),
                             "uni": pa.array(uni[keep], pa.int64())})
        return pa.table({"doc_a": pa.array(da[0::2][keep], pa.int64()),
                         "doc_b": pa.array(db[0::2][keep], pa.int64()),
                         "jaccard": pa.array(jac[keep], pa.float64())})

    return (
        halves.repartition(n_parts, keys=["doc_a", "doc_b"])
        .map_batches(judge_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
    )


# ---------------------------------------------------------------------------
# simhash_dups — near-duplicate pairs by SimHash hamming distance
# ---------------------------------------------------------------------------

SIMHASH_MAX_HAMMING = 3


def simhash_dups(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING) -> rd.Dataset:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming.

    Blocking: 4 × 16-bit bands — any pair within hamming ≤ 3 shares at least
    one intact band (pigeonhole), so recall vs brute force is exact.
    Output: (doc_a, doc_b, hamming).
    """
    import ray

    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text"])

    def sig_rows(t: pa.Table) -> pa.Table:
        sigs = _batch_simhash(t["text"])  # vectorized; == simhash64 per row
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        bands = np.arange(4, dtype=np.uint64)
        keys = ((sigs[:, None] >> (bands[None, :] * np.uint64(16)))
                & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(4, dtype=np.int32), n), pa.int32()),
            "band_key": pa.array(keys.reshape(-1), pa.int32()),
            "sig": pa.array(np.repeat(sigs, 4), pa.uint64()),
        })

    ham_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("hamming", pa.int64())])

    def pairs_block(block: pa.Table) -> pa.Table:
        """Hamming-filtered pairs of every (band_id, band_key) run in the
        block, via the shared size-stacked triu kernel."""
        if block.num_rows == 0:
            return ham_schema.empty_table()
        bid = block["band_id"].to_numpy(zero_copy_only=False)
        key = block["band_key"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        sigs = block["sig"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_a, out_b, out_h = [], [], []
        for ia, ib in _bucket_pair_indices(bid, key):
            x = (sigs[ia] ^ sigs[ib])
            ham = np.unpackbits(x.view(np.uint8)).reshape(-1, 64) \
                .sum(axis=1).astype(np.int64)
            A, B = ids[ia], ids[ib]
            keep = (ham <= max_hamming) & (A != B)  # no self-pairs
            out_a.append(np.minimum(A[keep], B[keep]))
            out_b.append(np.maximum(A[keep], B[keep]))
            out_h.append(ham[keep])
        if not out_a:
            return ham_schema.empty_table()
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), pa.int64()),
        })

    _ = ray  # broadcast not needed: signatures travel with the band rows

    from ray.data.aggregate import Min as _Min

    n_parts = _auto_partitions(f"{sf_dir}/documents.parquet")
    band_rows = ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)
    _tune_exchange(band_rows, n_parts)
    return (
        band_rows.repartition(n_parts, keys=["band_id", "band_key"])
        .map_batches(pairs_block, batch_format="pyarrow", batch_size=None,
                     zero_copy_batch=True)
        .groupby(["doc_a", "doc_b"], num_partitions=16)  # dedup pairs, keep hamming
        .aggregate(_Min("hamming", alias_name="hamming"))
    )


# ---------------------------------------------------------------------------
# chargram_jaccard_dups — exact char-set Jaccard similarity join within
# source blocks (SQL-oracled: DuckDB's jaccard() is char-set Jaccard)
# ---------------------------------------------------------------------------

CHARGRAM_THRESHOLD = 0.8


def chargram_jaccard_dups(sf_dir: str, threshold: float = CHARGRAM_THRESHOLD) -> rd.Dataset:
    """Similar-document pairs by exact character-set Jaccard, blocked by
    (`source`, charset-size bucket).

    Skew guard (lossless): jaccard(A,B) ≥ t implies |A|/|B| ≥ t (since
    |A∩B| ≤ min and |A∪B| ≥ max), so with geometric size buckets of ratio
    1/t a qualifying pair sits in the same or adjacent buckets. Each doc is
    native in its own bucket and a visitor in the next; a group compares
    native×native and native×(visitor-from-previous) only — every
    qualifying pair exactly once, and a hot `source` key splits into
    bounded-size bucket groups instead of pinning one worker with an O(n²)
    monolith. Within a group the compare is one vectorized bitset matmul
    (union-alphabet bitmask + popcount), not a Python pair loop.

    Output: (doc_a, doc_b, jac). Matches DuckDB's jaccard() semantics exactly
    (distinct unicode characters of each string).
    """
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "text", "source"])
    # widened denominator: for size ratio exactly t the bucket distance is
    # strictly < 1 even under float rounding, so "adjacent buckets" holds
    log_inv_t = np.log(1.0 / threshold) * (1 + 1e-9)

    def bucket_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        srcs = t["source"].to_pylist()
        texts = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) \
            else t["text"]
        texts = pc.fill_null(texts, "")
        n = len(ids)
        # per-doc distinct codepoints, vectorized: ONE utf-8 decode + ONE
        # utf-32 encode for the whole batch (utf-8 is self-delimiting, so
        # decoding the concatenated data buffer equals per-doc decodes), then
        # a (doc, code) lexsort + first-in-run mask replaces per-row
        # np.unique — no Python loop over rows
        off_dt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
        bufs = texts.buffers()
        offs = np.frombuffer(bufs[1], off_dt)[texts.offset: texts.offset + n + 1] \
            .astype(np.int64)
        raw = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
            else np.empty(0, np.uint8)
        full = raw[offs[0]: offs[-1]].tobytes().decode("utf-8")
        codes = np.frombuffer(full.encode("utf-32-le"), np.uint32)
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(n), lens)
        order = np.lexsort((codes, doc))
        d_s, c_s = doc[order], codes[order]
        uniq = np.zeros(len(order), bool)
        if len(order):
            uniq[0] = True
            uniq[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        sizes = np.bincount(d_s[uniq], minlength=n).astype(np.int64)
        bucket = np.where(
            sizes > 0, np.floor(np.log(np.maximum(sizes, 1)) / log_inv_t), -1
        ).astype(np.int64)
        flat = c_s[uniq].astype(np.uint64)
        blobs = _shingle_blob_col(flat, sizes)
        native = pa.table({
            "source": pa.array(srcs, pa.string()),
            "bucket": pa.array(bucket, pa.int64()),
            "visitor": pa.array(np.zeros(len(ids), np.bool_)),
            "doc_id": pa.array(ids, pa.int64()),
            "charset": blobs,
        })
        probe = sizes > 0  # size-0 docs pair only with each other (bucket -1)
        visitor = pa.table({
            "source": pa.array([s for s, p in zip(srcs, probe) if p], pa.string()),
            "bucket": pa.array(bucket[probe] + 1, pa.int64()),
            "visitor": pa.array(np.ones(int(probe.sum()), np.bool_)),
            "doc_id": pa.array(ids[probe], pa.int64()),
            "charset": blobs.filter(pa.array(probe)),
        })
        return pa.concat_tables([native, visitor])

    out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("jac", pa.float64())])

    def group_pairs(run: pa.Table) -> pa.Table:
        ids = run["doc_id"].to_numpy(zero_copy_only=False)
        vis = run["visitor"].to_numpy(zero_copy_only=False)
        flat, cnt = _decode_shingle_blobs(run["charset"])
        n = len(ids)
        n_nat = int((~vis).sum())
        if n_nat == 0 or n < 2:
            return out_schema.empty_table()
        # bitset matrix over the group's union alphabet
        alphabet = np.unique(flat)
        words = max(1, (len(alphabet) + 63) // 64)
        X = np.zeros((n, words), np.uint64)
        starts = np.zeros(n + 1, np.int64)
        np.cumsum(cnt, out=starts[1:])
        pos = np.searchsorted(alphabet, flat)
        row = np.repeat(np.arange(n), cnt)
        np.bitwise_or.at(X, (row, pos // 64), np.uint64(1) << (pos % 64).astype(np.uint64))
        sizes = cnt.astype(np.int64)
        # candidate index pairs: native×native (i<j) + native×visitor
        nat = np.nonzero(~vis)[0]
        ia, ib = np.triu_indices(n_nat, k=1)
        pi, pj = nat[ia], nat[ib]
        visi = np.nonzero(vis)[0]
        if visi.size:
            gi, gj = np.meshgrid(nat, visi, indexing="ij")
            pi = np.concatenate([pi, gi.reshape(-1)])
            pj = np.concatenate([pj, gj.reshape(-1)])
        inter = np.unpackbits((X[pi] & X[pj]).view(np.uint8), axis=1) \
            .sum(axis=1).astype(np.int64)
        union = sizes[pi] + sizes[pj] - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
        keep = jac >= threshold
        a, b = ids[pi][keep], ids[pj][keep]
        return pa.table({
            "doc_a": pa.array(np.minimum(a, b), pa.int64()),
            "doc_b": pa.array(np.maximum(a, b), pa.int64()),
            "jac": pa.array(jac[keep], pa.float64()),
        })

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _per_key_runs(rows, ["source", "bucket"], group_pairs, out_schema,
                         num_partitions=_auto_partitions(f"{sf_dir}/documents.parquet"))


SQL_CHARGRAM = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, jaccard(a.text, b.text) AS jac
FROM documents a
JOIN documents b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE jaccard(a.text, b.text) >= {CHARGRAM_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# embedding_neardup — cosine near-duplicate pairs over the embeddings table
# ---------------------------------------------------------------------------

COSINE_THRESHOLD = 0.4
NEARDUP_BLOCKS = 8  # √-replication factor of the block-pair self-join


def embedding_neardup(sf_dir: str, threshold: float = COSINE_THRESHOLD,
                      num_blocks: int = NEARDUP_BLOCKS) -> rd.Dataset:
    """Pairs with cosine(embedding_a, embedding_b) ≥ threshold — EXACT, via a
    distributed block-pair self-join (no driver materialization, no
    whole-table broadcast; the 0.4 threshold is far below the regime where
    LSH bucketing can stay exact, so the scale path is the classic
    O(n·√P)-communication all-pairs decomposition instead).

    Each vector lands in block b = vec_id % num_blocks and is replicated to
    every block-pair group (min(b,b'), max(b,b')) — num_blocks copies per
    row. One hash exchange co-locates each group; a group computes its
    cross-block (or triangular, when b==b') cosine matrix with one float64
    matmul. Every qualifying pair occurs in exactly one group, so no dedup
    pass is needed. Output: (vec_a, vec_b, cos_sim_u) with the similarity
    integerized at 1e-6 (micro-units) so the SQL oracle hash-matches.
    """
    ds = pruned_read(f"{sf_dir}/embeddings.parquet", ["vec_id", "embedding"])

    def replicate(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        b = (ids % num_blocks).astype(np.int32)
        # row i joins groups (min(b,j), max(b,j)) for every j — num_blocks rows
        js = np.arange(num_blocks, dtype=np.int32)
        bi = np.minimum(b[:, None], js[None, :]).reshape(-1)
        bj = np.maximum(b[:, None], js[None, :]).reshape(-1)
        idx = pa.array(np.repeat(np.arange(len(ids), dtype=np.int64), num_blocks))
        return pa.table({
            "bi": pa.array(bi, pa.int32()),
            "bj": pa.array(bj, pa.int32()),
            "vec_id": t["vec_id"].take(idx) if not isinstance(t["vec_id"], pa.ChunkedArray) else t["vec_id"].combine_chunks().take(idx),
            "embedding": t["embedding"].combine_chunks().take(idx) if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"].take(idx),
        })

    out_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                            ("cos_sim_u", pa.int64())])

    def group_pairs(run: pa.Table) -> pa.Table:
        gi = int(run["bi"][0].as_py())
        gj = int(run["bj"][0].as_py())
        ids = run["vec_id"].to_numpy(zero_copy_only=False)
        # each vec_id appears exactly once per group; np.unique is for the
        # ascending order the triangular mask below relies on
        ids_u, first = np.unique(ids, return_index=True)
        from ocrautomator_ray.functions.ann import _embed_matrix

        E = _embed_matrix(run)[first]
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        blk = (ids_u % num_blocks).astype(np.int32)
        if gi == gj:
            S = En @ En.T
            ia, ib = np.nonzero(np.triu(S >= threshold, k=1))
            va, vb, sim = ids_u[ia], ids_u[ib], S[ia, ib]
        else:
            mi, mj = blk == gi, blk == gj
            S = En[mi] @ En[mj].T
            ia, ib = np.nonzero(S >= threshold)
            va, vb, sim = ids_u[mi][ia], ids_u[mj][ib], S[ia, ib]
            va, vb = np.minimum(va, vb), np.maximum(va, vb)
        if len(va) == 0:
            return out_schema.empty_table()
        return pa.table({
            "vec_a": pa.array(va, pa.int64()),
            "vec_b": pa.array(vb, pa.int64()),
            "cos_sim_u": pa.array(
                np.floor(sim * 1_000_000 + 0.5).astype(np.int64), pa.int64()),
        })

    rep = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    return _per_key_runs(rep, ["bi", "bj"], group_pairs, out_schema,
                         num_partitions=num_blocks * (num_blocks + 1) // 2)


SQL_EMBEDDING_NEARDUP = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(FLOOR(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))*1000000 + 0.5)
            AS BIGINT) AS cos_sim_u
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {COSINE_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# minhash_dup_clusters — connected components over the near-dup pair graph
# (hash-to-min label propagation, Rastogi et al., ICDE 2013): each round every
# node broadcasts the minimum id of its neighborhood to all neighbors via a
# groupby — O(log n) rounds, all Dataset ops, no driver-side graph. Near-dup
# components are small cliques, so it converges in 2-3 rounds in practice.
# ---------------------------------------------------------------------------

def _round_fingerprint(sf_dir: str, threshold: float) -> dict:
    """Identity of a propagation checkpoint's input: a checkpoint taken over
    a different documents table (or threshold) must never be resumed."""
    import os

    p = f"{sf_dir}/documents.parquet"
    st = os.stat(p)
    return {"input": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns,
            "threshold": threshold}


def _committed_rounds(checkpoint_dir: str) -> list[tuple[int, str, dict]]:
    """Sorted (round, data_dir, meta) for every committed round — committed
    means BOTH the parquet dir and its meta marker exist (the marker is
    written last, so a kill between the two leaves the round uncommitted
    and it is simply re-executed from its predecessor)."""
    import glob
    import json
    import os

    out = []
    for mp in glob.glob(os.path.join(checkpoint_dir, "round-*.json")):
        d = mp[:-5]
        try:
            with open(mp) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if os.path.isdir(d):
            out.append((int(os.path.basename(d).split("-")[1]), d, meta))
    return sorted(out)


def _prepare_checkpoint_dir(checkpoint_dir: str, fp: dict) -> None:
    """Create/validate the checkpoint root: wipe it when its fingerprint
    doesn't match this run's input; always clear stale tmp dirs."""
    import json
    import os
    import shutil

    os.makedirs(checkpoint_dir, exist_ok=True)
    fp_path = os.path.join(checkpoint_dir, "fingerprint.json")
    stale = True
    try:
        with open(fp_path) as f:
            stale = json.load(f) != fp
    except (OSError, json.JSONDecodeError):
        pass
    if stale:
        shutil.rmtree(checkpoint_dir)
        os.makedirs(checkpoint_dir)
        tmp = fp_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(fp, f)
        os.rename(tmp, fp_path)
    else:
        for e in os.scandir(checkpoint_dir):
            if e.name.endswith(".tmpdir"):
                shutil.rmtree(e.path, ignore_errors=True)


def _commit_round_data(adj: rd.Dataset, rnd: int,
                       checkpoint_dir: str) -> rd.Dataset:
    """Persist a round's adjacency (tmp dir + rename = atomic commit of the
    data half) and return the read-back dataset — the parquet IS the round's
    materialization, so a resumed driver starts from disk, not round 0."""
    import os
    import shutil

    d = os.path.join(checkpoint_dir, f"round-{rnd:04d}")
    tmp = d + ".tmpdir"
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.isdir(d):  # data committed but meta missing: redo cleanly
        shutil.rmtree(d)
    adj.write_parquet(tmp)
    os.rename(tmp, d)
    return rd.read_parquet(d)


def _commit_round_meta(rnd: int, checkpoint_dir: str, sig: int,
                       converged: bool) -> None:
    import json
    import os

    mp = os.path.join(checkpoint_dir, f"round-{rnd:04d}.json")
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"sig": sig, "converged": converged}, f)
    os.rename(tmp, mp)


def minhash_dup_clusters(sf_dir: str, threshold: float = MINHASH_THRESHOLD,
                         max_rounds: int = 12,
                         checkpoint_dir: str | None = None) -> rd.Dataset:
    """(doc_id, cluster_id) for every doc in ≥1 verified near-dup pair;
    cluster_id = min doc_id of its connected component.

    ``checkpoint_dir`` (optional) makes the ITERATION restartable, not just
    the sink downstream of it: each propagation round commits its adjacency
    (atomic tmp+rename parquet dir, then a meta marker with the round's
    convergence signature), so a driver killed mid-propagation resumes from
    the last committed round — at 10^12 docs each round is a full exchange
    over the node-sized adjacency, the expensive thing to lose. Checkpoints
    are fingerprinted to the input table; a changed input wipes them."""
    pairs = minhash_lsh_dups(sf_dir, threshold).select_columns(["doc_a", "doc_b"])
    fp = (_round_fingerprint(sf_dir, threshold)
          if checkpoint_dir is not None else None)
    return propagate_min_labels(pairs, max_rounds=max_rounds,
                                checkpoint_dir=checkpoint_dir,
                                fingerprint=fp)


def propagate_min_labels(pairs: rd.Dataset, max_rounds: int = 12,
                         checkpoint_dir: str | None = None,
                         fingerprint: dict | None = None) -> rd.Dataset:
    """Connected components of the undirected graph given as (doc_a, doc_b)
    pair rows: (doc_id, cluster_id = component-min doc_id) for every node.
    Hash-to-min label propagation (Rastogi et al., ICDE 2013) — one hash
    exchange per round, adjacency shrinks to ~nodes rows, O(log n) rounds.
    Shared by every pair source (MinHash near-dups, mutual-kNN embedding
    components); ``checkpoint_dir``/``fingerprint`` commit each round as in
    minhash_dup_clusters' docstring."""

    def seed_adj(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b, a, b]), pa.int64()),
            "v": pa.array(np.concatenate([b, a, a, b]), pa.int64()),
        })

    adj = pairs.map_batches(seed_adj, batch_format="pyarrow", zero_copy_batch=True)

    adj_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    _SIG_MIX = np.uint64(1315423911)

    def propagate_block(block: pa.Table) -> pa.Table:
        # hash-to-min over ALL of a block's u-groups at once (vectorized run
        # splitting — no per-group pandas dispatch): send the neighborhood
        # minimum to every neighbor AND the whole neighborhood to the minimum
        # node (both halves are required for chains to collapse in O(log n)
        # rounds). In-block (u,v) dedup IS global dedup: the exchange key is
        # u, so every copy of an edge lands in the same block — this folds
        # the former dedup_edges groupby into the same exchange. The block
        # ALSO emits one (u=-1, v=sig_partial) row — the block's share of the
        # label signature Σ hash(u, min_v) of the INPUT adjacency — so the
        # driver's convergence test is a cheap scan of the materialized
        # output instead of a per-round groupby+aggregate pass (the sequence
        # of signatures compared is identical, observed one round later).
        if block.num_rows == 0:
            return adj_schema.empty_table()
        u = block["u"].to_numpy(zero_copy_only=False)
        v = block["v"].to_numpy(zero_copy_only=False)
        live = u >= 0  # drop last round's signature rows
        u, v = u[live], v[live]
        if len(u) == 0:
            return adj_schema.empty_table()
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        keep = np.ones(len(us), bool)
        keep[1:] = (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])
        us, vs = us[keep], vs[keep]
        starts = np.nonzero(np.r_[True, us[1:] != us[:-1]])[0]
        run_len = np.diff(np.r_[starts, len(us)])
        # within a run vs is sorted ascending, so the neighborhood min is the
        # first element; include u itself as hash-to-min requires
        mins = np.minimum(vs[starts], us[starts])
        m = np.repeat(mins, run_len)
        with np.errstate(over="ignore"):  # uint64 wrap is the intended mix
            sig = int((us[starts].astype(np.uint64) * _SIG_MIX
                       + mins.astype(np.uint64)).sum(dtype=np.uint64)
                      .astype(np.int64))
        return pa.table({
            "u": pa.array(np.concatenate([vs, m, [-1]]), pa.int64()),
            "v": pa.array(np.concatenate([m, vs, [sig]]), pa.int64()),
        })

    def scan_signature(ds: rd.Dataset) -> int:
        # sum the u=-1 partials over the (already materialized) adjacency
        def partial(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False)
            v = t["v"].to_numpy(zero_copy_only=False)
            s = v[u < 0].astype(np.uint64).sum(dtype=np.uint64)
            return pa.table({"s": pa.array([np.int64(s)], pa.int64())})

        with np.errstate(over="ignore"):
            part = ds.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()
            return int(part["s"].to_numpy().astype(np.uint64)
                       .sum(dtype=np.uint64))

    from ocrautomator_ray.functions.exchange import per_key_blocks

    prev_sig = None
    start_round = 0
    converged = False
    if checkpoint_dir is not None:
        _prepare_checkpoint_dir(checkpoint_dir, fingerprint or {})
        rounds = _committed_rounds(checkpoint_dir)
        if rounds:
            rnd, d, meta = rounds[-1]
            adj = rd.read_parquet(d)
            prev_sig = meta["sig"]
            start_round = rnd + 1
            converged = bool(meta.get("converged"))

    # Adaptive round checkpointing: a disk commit only pays when re-executing
    # the round on resume would cost MORE than the commit itself, so commit a
    # round iff its wall time clears OCRA_CKPT_MIN_ROUND_SEC (default 3 s) OR
    # it is the convergence round (committing that one makes a rerun over
    # unchanged input a zero-round no-op). At 10^12 docs every round is a
    # multi-minute exchange and always commits; at bench scale the rounds are
    # sub-second and the parquet round-trip per round was pure overhead.
    min_round_sec = float(os.environ.get("OCRA_CKPT_MIN_ROUND_SEC", "3.0"))
    for rnd in range(start_round, max_rounds):
        if converged:
            break
        # one hash exchange per round (propagate + dedup + signature fused
        # in-block); adjacency shrinks to ~nodes rows so the per-round pin
        # is small
        t0 = time.monotonic()
        adj = per_key_blocks(adj, ["u"], propagate_block,
                             num_partitions=8).materialize()
        wall = time.monotonic() - t0
        sig = scan_signature(adj)
        converged = sig == prev_sig
        if checkpoint_dir is not None and (wall >= min_round_sec or converged):
            # write from the materialized blocks (no recompute); keep using
            # the in-memory adjacency — the disk copy exists for a RESUMED
            # driver, not this one
            _commit_round_data(adj, rnd, checkpoint_dir)
            _commit_round_meta(rnd, checkpoint_dir, sig, converged)
        prev_sig = sig

    def final_labels(block: pa.Table) -> pa.Table:
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("cluster_id", pa.int64())])
        if block.num_rows == 0:
            return out_schema.empty_table()
        u = block["u"].to_numpy(zero_copy_only=False)
        v = block["v"].to_numpy(zero_copy_only=False)
        live = u >= 0
        u, v = u[live], v[live]
        if len(u) == 0:
            return out_schema.empty_table()
        order = np.lexsort((v, u))
        us, vs = u[order], v[order]
        starts = np.nonzero(np.r_[True, us[1:] != us[:-1]])[0]
        return pa.table({
            "doc_id": pa.array(us[starts], pa.int64()),
            "cluster_id": pa.array(vs[starts], pa.int64()),
        })

    return per_key_blocks(adj, ["u"], final_labels, num_partitions=8)


# ---------------------------------------------------------------------------
# Exact SQL oracles for the MinHash and SimHash pipelines. Every step is
# modular integer arithmetic (FNV-1a mod 2^64, universal hashing mod 2^61-1,
# bit majorities), so DuckDB mirrors them bit-for-bit: the byte/value FNV
# fold is a list_reduce lambda over HUGEINT with an xor round-trip through
# BIGINT two's complement, the 64 permutation constants are inlined from the
# module's deterministic _A/_B, and the final jaccard/hamming filters are
# the same single IEEE division / bit_count both engines compute. Caveats
# (both irrelevant to the driver corpus — pure [a-z ], ≥10 words per doc):
# the engine tokenizes with Unicode whitespace (str.split) vs the oracle's
# RE2 '\\s+' (identical on ASCII), and a fully EMPTY document gets sentinel
# band keys in the engine but produces no SQL rows.
# ---------------------------------------------------------------------------

_SQL_M64 = 1 << 64
_SQL_HALF = 1 << 63


def _sql_signed(v: str) -> str:
    """uint64-as-HUGEINT → BIGINT two's complement."""
    return (f"CAST(CASE WHEN {v} >= {_SQL_HALF} THEN {v} - {_SQL_M64} "
            f"ELSE {v} END AS BIGINT)")


def _sql_fnv_fold() -> str:
    """(acc, x) lambda body: one FNV-1a round, acc/x HUGEINT in [0, 2^64)."""
    x2 = f"xor({_sql_signed('acc')}, CAST(x AS BIGINT))"
    return (f"((CASE WHEN {x2} < 0 THEN CAST({x2} AS HUGEINT) + {_SQL_M64} "
            f"ELSE CAST({x2} AS HUGEINT) END) * {_FNV_PRIME_INT}) % {_SQL_M64}")


def _sql_fnv1a(expr: str) -> str:
    """FNV-1a of a string expression's bytes (== _hash_tokens/_fnv1a_strings)."""
    return (f"list_reduce(list_prepend(CAST({_FNV_OFFSET_INT} AS HUGEINT), "
            f"list_transform(range(1, len({expr})+1), "
            f"j -> CAST(ascii(substr({expr}, j, 1)) AS HUGEINT))), "
            f"(acc, x) -> {_sql_fnv_fold()})")


def _minhash_ctes() -> str:
    """The shared CTE chain ending in a ``ver`` relation (candidate pairs
    with exact intersection/union sizes)."""
    m61 = int(_MERSENNE)
    perm_rows = ",\n    ".join(
        f"({i}, CAST({int(a)} AS HUGEINT), CAST({int(b)} AS HUGEINT))"
        for i, (a, b) in enumerate(zip(_A, _B))
    )
    return f"""perm(i, a, b) AS (VALUES
    {perm_rows}
),
toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '\\s+'),
                       t -> t <> '') AS w
    FROM documents
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) >= 3
                THEN w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                ELSE array_to_string(w, ' ') END AS s
    FROM toks,
         LATERAL (SELECT unnest(range(1,
             CASE WHEN len(w) >= 3 THEN len(w) - 1
                  WHEN len(w) > 0 THEN 2 ELSE 1 END)) AS i) u
),
sh AS (SELECT DISTINCT doc_id, {_sql_fnv1a('s')} AS h FROM grams),
sig AS (
    SELECT doc_id, i, min(((a * h) % {_SQL_M64} + b) % {_SQL_M64} % {m61}) AS s
    FROM sh, perm GROUP BY doc_id, i
),
bk AS (
    SELECT p0.doc_id, CAST(p0.i // {_ROWS_PER_BAND} AS INT) AS band_id,
           list_reduce(
               list_prepend(CAST({_FNV_OFFSET_INT} AS HUGEINT),
                            [p0.s, p1.s, p2.s, p3.s]),
               (acc, x) -> {_sql_fnv_fold()}) AS band_key
    FROM sig p0
    JOIN sig p1 ON p1.doc_id = p0.doc_id AND p1.i = p0.i + 1
    JOIN sig p2 ON p2.doc_id = p0.doc_id AND p2.i = p0.i + 2
    JOIN sig p3 ON p3.doc_id = p0.doc_id AND p3.i = p0.i + 3
    WHERE p0.i % {_ROWS_PER_BAND} = 0
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bk x JOIN bk y
      ON x.band_id = y.band_id AND x.band_key = y.band_key
     AND x.doc_id < y.doc_id
),
shl AS (SELECT doc_id, list(h) AS hs FROM sh GROUP BY doc_id),
ver AS (
    SELECT doc_a, doc_b,
           len(list_intersect(sa.hs, sb.hs)) AS inter,
           len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)) AS uni,
           len(sa.hs) AS size_a, len(sb.hs) AS size_b
    FROM cand
    JOIN shl sa ON sa.doc_id = doc_a
    JOIN shl sb ON sb.doc_id = doc_b
)"""


def _minhash_sql() -> str:
    return f"""
WITH {_minhash_ctes()}
SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
FROM ver
WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= {MINHASH_THRESHOLD}
"""


def _clusters_sql() -> str:
    """Connected components over the verified pair set: a recursive
    transitive closure (the pair graphs are near-clique and tiny, so the
    closure is small); cluster_id = min doc_id of the component."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
dup AS MATERIALIZED (
    -- MATERIALIZED: dup hangs off the expensive minhash-verify chain and is
    -- referenced from a recursive closure; without the hint DuckDB re-inlines
    -- (and re-evaluates) the whole chain per reference, which is minutes of
    -- oracle wall at 50k docs for an identical result
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
)
SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
"""


def _simhash_sql() -> str:
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS w
    FROM documents
),
th AS (SELECT doc_id, {_sql_fnv1a('w')} AS h FROM tok),
bits AS (
    SELECT doc_id, b,
           CASE WHEN 2 * SUM((h // CAST(pow2 AS HUGEINT)) % 2) > COUNT(*)
                THEN CAST(pow2 AS HUGEINT) ELSE 0 END AS contrib
    FROM th,
         LATERAL (SELECT unnest(range(0, 64)) AS b,
                         unnest(list_transform(range(0, 64),
                                i -> CAST(1 AS HUGEINT) << CAST(i AS INT)))
                             AS pow2) u
    GROUP BY doc_id, b, pow2
),
sig AS (SELECT doc_id, SUM(contrib) AS s FROM bits GROUP BY doc_id),
bk AS (
    SELECT doc_id, s, CAST(band AS INT) AS band_id,
           CAST((s // (CAST(1 AS HUGEINT) << CAST(16 * band AS INT))) % 65536
                AS INT) AS band_key
    FROM sig, LATERAL (SELECT unnest(range(0, 4)) AS band) u
),
cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
           x.s AS sa, y.s AS sb
    FROM bk x JOIN bk y
      ON x.band_id = y.band_id AND x.band_key = y.band_key
     AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor({_sql_signed('sa')}, {_sql_signed('sb')}))
            AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor({_sql_signed('sa')}, {_sql_signed('sb')}))
      <= {SIMHASH_MAX_HAMMING}
"""


SQL_MINHASH_LSH_DUPS = _minhash_sql()
SQL_MINHASH_DUP_CLUSTERS = _clusters_sql()
SQL_SIMHASH_DUPS = _simhash_sql()


# ---------------------------------------------------------------------------
# neardup_removed_docs — the near-dup REMOVAL step: keep every document that
# is either not in any verified near-dup cluster or is its cluster's
# canonical member (min doc_id). The drop side can be a large fraction of a
# web corpus — far too big for a broadcast set — so this is the large×large
# LEFT ANTI join: documents hash-partitioned against the non-canonical
# member list with Dataset.join("left_anti").
# ---------------------------------------------------------------------------

def neardup_removed_docs(sf_dir: str) -> rd.Dataset:
    import pyarrow.compute as pc

    drop = minhash_dup_clusters(sf_dir).map_batches(
        lambda t: t.filter(
            pc.not_equal(t["doc_id"], t["cluster_id"])
        ).select(["doc_id"]).rename_columns(["drop_id"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    docs = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id", "n_chars"])
    _tune_exchange(docs)
    return docs.join(drop, join_type="left_anti",
                     num_partitions=_auto_partitions(
                         f"{sf_dir}/documents.parquet"),
                     on=("doc_id",), right_on=("drop_id",))


def _neardup_removed_sql() -> str:
    return f"""
WITH RECURSIVE {_minhash_ctes()},
dup AS MATERIALIZED (
    -- MATERIALIZED: dup hangs off the expensive minhash-verify chain and is
    -- referenced from a recursive closure; without the hint DuckDB re-inlines
    -- (and re-evaluates) the whole chain per reference, which is minutes of
    -- oracle wall at 50k docs for an identical result
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
clusters AS (
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
)
SELECT d.doc_id, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
"""


SQL_NEARDUP_REMOVED = _neardup_removed_sql()


# ---------------------------------------------------------------------------
# neardup_jaccard_hist — the threshold-tuning audit table: how many verified
# LSH candidate pairs fall in each jaccard decile.  Run BEFORE committing to
# a MINHASH_THRESHOLD: the histogram shows where the corpus's pair-similarity
# mass sits so the cutoff lands in a valley, not mid-cluster.  Deciles are
# EXACT integer arithmetic on the (inter, uni) set sizes (inter*10 // uni) —
# never floor(float_jaccard*10), whose 0.7*10 == 6.999… boundary would
# misbucket — via verified_pair_stage's emit_counts hook at threshold 0.
# ---------------------------------------------------------------------------

_HIST_SCHEMA = pa.schema([("decile", pa.int64()), ("n_pairs", pa.int64())])


def neardup_jaccard_hist(sf_dir: str) -> rd.Dataset:
    """(decile, n_pairs): verified candidate pairs per jaccard decile —
    decile = min(inter*10 // uni, 9), with uni == 0 (two empty shingle
    sets, jaccard 1.0 by convention) in decile 9."""
    pairs = minhash_lsh_dups(sf_dir, threshold=0.0, emit_counts=True)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HIST_SCHEMA.empty_table()
        inter = t["inter"].to_numpy(zero_copy_only=False)
        uni = t["uni"].to_numpy(zero_copy_only=False)
        dec = np.where(uni == 0, 9,
                       np.minimum(inter * 10 // np.maximum(uni, 1), 9))
        counts = np.bincount(dec, minlength=10)
        nz = np.nonzero(counts)[0]
        return pa.table({"decile": pa.array(nz, pa.int64()),
                         "n_pairs": pa.array(counts[nz], pa.int64())})

    def final_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _HIST_SCHEMA.empty_table()
        g = pa.TableGroupBy(block, ["decile"]).aggregate([("n_pairs", "sum")])
        return pa.table({"decile": g["decile"],
                         "n_pairs": g["n_pairs_sum"].cast(pa.int64())})

    return per_key_blocks(
        pairs.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["decile"], final_block, num_partitions=2)


SQL_NEARDUP_JACCARD_HIST = f"""
WITH {_minhash_ctes()}
SELECT CAST(CASE WHEN uni = 0 THEN 9
            ELSE LEAST(inter * 10 // uni, 9) END AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM ver GROUP BY 1
"""


QUERIES = {
    "minhash_lsh_dups": minhash_lsh_dups,
    "neardup_jaccard_hist": neardup_jaccard_hist,
    "minhash_dup_clusters": minhash_dup_clusters,
    "simhash_dups": simhash_dups,
    "neardup_removed_docs": neardup_removed_docs,
    "chargram_jaccard_dups": chargram_jaccard_dups,
    "embedding_neardup": embedding_neardup,
}

SQL = {
    "minhash_lsh_dups": SQL_MINHASH_LSH_DUPS,
    "neardup_jaccard_hist": SQL_NEARDUP_JACCARD_HIST,
    "minhash_dup_clusters": SQL_MINHASH_DUP_CLUSTERS,
    "simhash_dups": SQL_SIMHASH_DUPS,
    "neardup_removed_docs": SQL_NEARDUP_REMOVED,
    "chargram_jaccard_dups": SQL_CHARGRAM,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
}


# ---------------------------------------------------------------------------
# containment_pairs — asymmetric near-dup detection: pairs where the SMALLER
# shingle set is mostly inside the larger one (containment = inter / min
# size ≥ 0.8), the "partial copy / quoted excerpt / page-within-site" cases
# a symmetric Jaccard threshold misses (a 10-shingle quote inside a
# 500-shingle page has jaccard ≈ 0.02 but containment 1.0). Candidates come
# from the SAME banded-MinHash exchange (threshold 0 at the verify step,
# integer containment filter after) — honest caveat: jaccard banding
# under-recalls extreme small-in-big pairs; a production containment search
# bands the bottom-k sketch of the SMALLER side (Broder's containment
# estimator), same exchange shape. The verify stage emits symmetric
# (inter, smin, smax) set sizes — the two halves of a pair arrive in
# exchange order, so per-side sizes aren't attributable, and containment
# only needs the min.
# ---------------------------------------------------------------------------

CONTAIN_NUM, CONTAIN_DEN = 4, 5       # containment ≥ 0.8, exact integers


def containment_pairs(sf_dir: str) -> rd.Dataset:
    """(doc_a, doc_b, inter, smin, smax, cont_permille) for banded candidate
    pairs with inter·DEN ≥ NUM·smin (empty-set pairs excluded)."""
    pairs = minhash_lsh_dups(sf_dir, threshold=0.0, emit_sizes=True)
    out_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()), ("inter", pa.int64()),
        ("smin", pa.int64()), ("smax", pa.int64()),
        ("cont_permille", pa.int64()),
    ])

    def screen(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        inter = t["inter"].to_numpy(zero_copy_only=False)
        smin = t["smin"].to_numpy(zero_copy_only=False)
        keep = (smin > 0) & (inter * CONTAIN_DEN >= CONTAIN_NUM * smin)
        t = t.filter(pa.array(keep))
        inter, smin = inter[keep], smin[keep]
        return t.append_column(
            "cont_permille", pa.array(inter * 1000 // smin, pa.int64()))

    return pairs.map_batches(screen, batch_format="pyarrow",
                             zero_copy_batch=True)


SQL_CONTAINMENT_PAIRS = f"""
WITH {_minhash_ctes()}
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
       CAST(LEAST(size_a, size_b) AS BIGINT) AS smin,
       CAST(GREATEST(size_a, size_b) AS BIGINT) AS smax,
       CAST(inter * 1000 // LEAST(size_a, size_b) AS BIGINT) AS cont_permille
FROM ver
WHERE LEAST(size_a, size_b) > 0
  AND inter * {CONTAIN_DEN} >= {CONTAIN_NUM} * LEAST(size_a, size_b)
"""


QUERIES["containment_pairs"] = containment_pairs
SQL["containment_pairs"] = SQL_CONTAINMENT_PAIRS


# ---------------------------------------------------------------------------
# dedup_rate_by_source — the dedup audit table: per source, how many docs
# and how many verified MinHash near-dup casualties (non-canonical cluster
# members). The number a crawl operator watches per snapshot ("src5 is 40%
# self-copies — stop crawling its mirror"). Composes the verified
# minhash_dup_clusters with one doc-keyed tagging exchange (source strings
# and drop flags move; text never does) and a per-batch (source) combiner
# into a tiny final aggregate.
# ---------------------------------------------------------------------------

def dedup_rate_by_source(sf_dir: str) -> rd.Dataset:
    """(source, n_docs, n_dups, dup_permille) — dup = non-canonical member
    of a verified near-dup cluster; permille exact integer."""
    from ray.data.aggregate import Sum

    path = f"{sf_dir}/documents.parquet"
    docs = pruned_read(path, ["doc_id", "source"])

    def drop_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = t.filter(pc.not_equal(t["doc_id"], t["cluster_id"]))
        return pa.table({
            "doc_id": sel["doc_id"],
            "source": pa.array([""] * sel.num_rows, pa.string()),
        })

    drops = minhash_dup_clusters(sf_dir).map_batches(
        drop_rows, batch_format="pyarrow", zero_copy_batch=True)

    tag_schema = pa.schema([("source", pa.string()), ("n", pa.int64()),
                            ("dups", pa.int64())])

    def tag_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return tag_schema.empty_table()
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        src = block["source"].to_numpy(zero_copy_only=False)
        is_doc = src != ""
        order = np.argsort(ids[~is_doc], kind="mergesort")
        dup_ids = ids[~is_doc][order]
        doc_ids, doc_src = ids[is_doc], src[is_doc]
        pos = np.searchsorted(dup_ids, doc_ids)
        safe = np.minimum(pos, max(len(dup_ids) - 1, 0))
        is_dup = ((pos < len(dup_ids)) & (dup_ids[safe] == doc_ids)
                  if len(dup_ids) else np.zeros(len(doc_ids), bool))
        order = np.argsort(doc_src, kind="mergesort")
        src_s, dup_s = doc_src[order], is_dup[order].astype(np.int64)
        starts = np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]])
        return pa.table({
            "source": pa.array(src_s[starts], pa.string()),
            "n": pa.array(np.diff(np.r_[starts, len(src_s)]), pa.int64()),
            "dups": pa.array(np.add.reduceat(dup_s, starts), pa.int64()),
        })

    partials = per_key_blocks(docs.union(drops), ["doc_id"], tag_block,
                              num_partitions=_auto_partitions(path))
    agg = (partials.groupby("source", num_partitions=2)
                   .aggregate(Sum("n", alias_name="n_docs"),
                              Sum("dups", alias_name="n_dups")))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("source", pa.string()),
                              ("n_docs", pa.int64()),
                              ("n_dups", pa.int64()),
                              ("dup_permille", pa.int64())]).empty_table()
        n = t["n_docs"].to_numpy(zero_copy_only=False)
        d = t["n_dups"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "dup_permille", pa.array(d * 1000 // n, pa.int64()))

    return agg.map_batches(finalize, batch_format="pyarrow",
                           zero_copy_batch=True)


def _dedup_rate_sql() -> str:
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
clusters AS (
    SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u
)
SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cl.doc_id IS NOT NULL
                      AND cl.cluster_id <> cl.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       CAST(SUM(CASE WHEN cl.doc_id IS NOT NULL
                      AND cl.cluster_id <> cl.doc_id
                     THEN 1 ELSE 0 END) * 1000 // COUNT(*) AS BIGINT)
           AS dup_permille
FROM documents d LEFT JOIN clusters cl USING (doc_id)
GROUP BY d.source
"""


SQL_DEDUP_RATE = _dedup_rate_sql()


QUERIES["dedup_rate_by_source"] = dedup_rate_by_source
SQL["dedup_rate_by_source"] = SQL_DEDUP_RATE


# --------------------------------------------------------------------------
# minhash_cluster_sizes — the dup-cluster size histogram, the audit table
# every dedup paper reports (how much of the corpus sits in pairs vs in
# large boilerplate blobs) and the number that drives the keep-one removal
# estimate: docs removed = Σ (size-1)·n_clusters. Distribution: the
# verified cluster table (doc_id, cluster_id) flows through ONE
# cluster-keyed exchange whose blocks reduce their co-located clusters to
# per-size bincount partials, then a tiny size-keyed groupby sums them —
# nothing larger than the cluster table ever moves, and the result is
# O(max cluster size) rows.
# --------------------------------------------------------------------------

_CSIZE_SCHEMA = pa.schema([("cluster_size", pa.int64()),
                           ("n_clusters", pa.int64())])


def minhash_cluster_sizes(sf_dir: str,
                          threshold: float = MINHASH_THRESHOLD) -> rd.Dataset:
    """(cluster_size, n_clusters): histogram of verified near-dup connected
    component sizes over the whole corpus."""
    from ray.data.aggregate import Sum

    from ocrautomator_ray.functions.exchange import per_key_blocks

    clusters = minhash_dup_clusters(sf_dir, threshold)

    def count_partial(t: pa.Table) -> pa.Table:
        # per-batch (cluster_id, n) — PARTIAL: a cluster's rows may span
        # batches, the exchange block below finishes the count
        g = pa.TableGroupBy(t.select(["cluster_id"]),
                            "cluster_id").aggregate([([], "count_all")])
        return pa.table({"cluster_id": g["cluster_id"],
                         "n": g["count_all"].cast(pa.int64())})

    def size_hist_block(block: pa.Table) -> pa.Table:
        # exchange invariant: every partial of a cluster is in this block,
        # so its size is exact here; reduce straight to a size histogram
        if block.num_rows == 0:
            return _CSIZE_SCHEMA.empty_table()
        cid = block["cluster_id"].to_numpy(zero_copy_only=False)
        n = block["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(cid, kind="mergesort")
        cid_s, n_s = cid[order], n[order]
        starts = np.flatnonzero(np.r_[True, cid_s[1:] != cid_s[:-1]])
        sizes = np.add.reduceat(n_s, starts)
        u, c = np.unique(sizes, return_counts=True)
        return pa.table({"cluster_size": pa.array(u, pa.int64()),
                         "n_clusters": pa.array(c.astype(np.int64),
                                                pa.int64())})

    partials = clusters.map_batches(count_partial, batch_format="pyarrow",
                                    zero_copy_batch=True)
    per_size = per_key_blocks(partials, ["cluster_id"], size_hist_block,
                              num_partitions=8)
    return per_size.groupby("cluster_size", num_partitions=4).aggregate(
        Sum("n_clusters", alias_name="n_clusters"))


SQL_CLUSTER_SIZES = f"""
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM ({SQL_MINHASH_DUP_CLUSTERS}) c GROUP BY cluster_id
) GROUP BY cluster_size
"""

QUERIES["minhash_cluster_sizes"] = minhash_cluster_sizes
SQL["minhash_cluster_sizes"] = SQL_CLUSTER_SIZES


# --------------------------------------------------------------------------
# neardup_source_matrix — WHICH sources duplicate against which: the
# directional complement of dedup_rate_by_source (that says how much of a
# source is duplicated; this says against whom — "this crawl mostly
# re-crawls last year's", "mirror A ≈ mirror B"). One row per unordered
# source pair with the count of verified near-dup pairs between them.
# Distribution: the verified pair stream hops through TWO doc-keyed
# exchanges that attach each endpoint's source by co-located searchsorted
# (the dedup_rate_by_source union-tag pattern, applied per endpoint), then
# per-batch (src_lo, src_hi) partials reduce in a sources²-bounded groupby
# — sources move, text and shingles never do.
# --------------------------------------------------------------------------

_SRCHOP_SCHEMA = pa.schema([("key", pa.int64()), ("other", pa.int64()),
                            ("src", pa.string())])
_SRCMAT_SCHEMA = pa.schema([("src_lo", pa.string()), ("src_hi", pa.string()),
                            ("n", pa.int64())])


def neardup_source_matrix(sf_dir: str,
                          threshold: float = MINHASH_THRESHOLD) -> rd.Dataset:
    """(src_lo, src_hi, n_pairs): verified near-dup pair counts per
    unordered source pair."""
    from ray.data.aggregate import Sum

    from ocrautomator_ray.functions.exchange import (auto_partitions,
                                                     pruned_read)

    path = f"{sf_dir}/documents.parquet"
    docs = pruned_read(path, ["doc_id", "source"])
    pairs = minhash_lsh_dups(sf_dir, threshold).select_columns(
        ["doc_a", "doc_b"])

    def doc_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["doc_id"],
                         "other": pa.array(np.full(t.num_rows, -1, np.int64),
                                           pa.int64()),
                         "src": t["source"]})

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["doc_a"], "other": t["doc_b"],
                         "src": pa.array([""] * t.num_rows, pa.string())})

    def _attach(block: pa.Table):
        """(pair-side rows with the key's source attached) — the block holds
        each key's single doc row (other == -1) plus its pair rows."""
        ids = block["key"].to_numpy(zero_copy_only=False)
        other = block["other"].to_numpy(zero_copy_only=False)
        src = block["src"].to_numpy(zero_copy_only=False)
        is_doc = other == -1
        d_keys, d_src = ids[is_doc], src[is_doc]
        order = np.argsort(d_keys, kind="mergesort")
        d_keys, d_src = d_keys[order], d_src[order]
        p = ~is_doc
        pos = np.searchsorted(d_keys, ids[p])  # FK-dense: always present
        return ids[p], other[p], src[p], d_src[pos]

    def hop1_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _SRCHOP_SCHEMA.empty_table()
        _, other, _, key_src = _attach(block)
        # re-key on the OTHER endpoint, carrying this endpoint's source;
        # other = -2 marks an attached pair row for hop 2
        return pa.table({"key": pa.array(other, pa.int64()),
                         "other": pa.array(np.full(len(other), -2, np.int64),
                                           pa.int64()),
                         "src": pa.array(key_src, pa.string())})

    def hop2_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _SRCMAT_SCHEMA.empty_table()
        _, _, src_a, src_b = _attach(block)
        lo = np.where(src_a < src_b, src_a, src_b)
        hi = np.where(src_a < src_b, src_b, src_a)
        g = pa.TableGroupBy(pa.table({
            "src_lo": pa.array(lo, pa.string()),
            "src_hi": pa.array(hi, pa.string()),
        }), ["src_lo", "src_hi"]).aggregate([([], "count_all")])
        return pa.table({"src_lo": g["src_lo"], "src_hi": g["src_hi"],
                         "n": g["count_all"].cast(pa.int64())})

    n_parts = auto_partitions(path)
    docs_tagged = docs.map_batches(doc_rows, batch_format="pyarrow",
                                   zero_copy_batch=True)
    pairs_tagged = pairs.map_batches(pair_rows, batch_format="pyarrow",
                                     zero_copy_batch=True)
    hop1 = per_key_blocks(docs_tagged.union(pairs_tagged), ["key"],
                          hop1_block, num_partitions=n_parts)
    hop2 = per_key_blocks(docs_tagged.union(hop1), ["key"], hop2_block,
                          num_partitions=n_parts)
    return hop2.groupby(["src_lo", "src_hi"], num_partitions=2).aggregate(
        Sum("n", alias_name="n_pairs"))


SQL_SOURCE_MATRIX = f"""
SELECT src_lo, src_hi, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM (
  SELECT LEAST(da.source, db.source) AS src_lo,
         GREATEST(da.source, db.source) AS src_hi
  FROM ({SQL_MINHASH_LSH_DUPS}) p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id
) GROUP BY src_lo, src_hi
"""

QUERIES["neardup_source_matrix"] = neardup_source_matrix
SQL["neardup_source_matrix"] = SQL_SOURCE_MATRIX
