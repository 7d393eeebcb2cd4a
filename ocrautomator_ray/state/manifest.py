"""Per-partition checkpoint manifests (SURVEY.md §4 "Checkpoint / resume").

Each committed output partition gets ``manifest/part-{pid:05d}.json`` written
atomically (tmp + ``os.replace``) *after* its data file commits, recording
lineage (input hash-partition → output fragment) and counters (pages OCR'd,
exif tags written, errors/retries) — the engine's version of the reference's
coarse "skip files whose output exists" resume, upgraded to O(partitions)
fragment-level pruning so exact resume stays cheap at 10^12 docs.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

# Fixed key so hash partitioning is deterministic across processes and runs —
# resume depends on doc → partition assignment being a pure function.
_HASH_KEY = "ocrautomator-ray"  # exactly 16 bytes, required by pandas siphash


def partition_ids(doc_ids: pa.Array | pa.ChunkedArray, num_partitions: int) -> np.ndarray:
    """Vectorized deterministic hash-partition assignment: siphash(doc_id) % P."""
    s = pd.Series(doc_ids.to_pandas() if hasattr(doc_ids, "to_pandas") else doc_ids)
    h = pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY, categorize=False)
    return (h.to_numpy() % np.uint64(num_partitions)).astype(np.int32)


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def part_data_path(out_dir: str, part_id: int) -> str:
    return os.path.join(data_dir(out_dir), f"part-{part_id:05d}.parquet")


def part_manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{part_id:05d}.json")


def write_part_manifest(out_dir: str, part_id: int, manifest: dict) -> None:
    """Atomic commit: write tmp in the same directory, then rename."""
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = part_manifest_path(out_dir, part_id)
    tmp = f"{final}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def run_manifest_path(out_dir: str) -> str:
    return os.path.join(manifest_dir(out_dir), "run.json")


def write_run_manifest(out_dir: str, manifest: dict) -> None:
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    final = run_manifest_path(out_dir)
    tmp = f"{final}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def load_run_manifest(out_dir: str) -> dict | None:
    p = run_manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def check_run_compatible(out_dir: str, num_partitions: int,
                         partition_by: str | None = None) -> None:
    """Fail fast when an existing out_dir was produced under a different
    partitioning: part-NNNNN names would overlap, leaving stale committed
    manifests/fragments that read_output would return alongside new ones.
    Reusing an out_dir is only valid with the same num_partitions AND the
    same hive partition_by (resume) — a mixed flat/hive layout would make
    selective value-directory reads silently incomplete."""
    rm = load_run_manifest(out_dir)
    if rm is not None and int(rm.get("num_partitions", -1)) != num_partitions:
        raise RuntimeError(
            f"out_dir {out_dir!r} was produced with num_partitions="
            f"{rm.get('num_partitions')}, refusing to write with "
            f"num_partitions={num_partitions}; use a fresh out_dir"
        )
    if rm is not None and rm.get("partition_by") != partition_by:
        raise RuntimeError(
            f"out_dir {out_dir!r} was produced with partition_by="
            f"{rm.get('partition_by')!r}, refusing to write with "
            f"partition_by={partition_by!r}; use a fresh out_dir"
        )
    stale = {
        pid: m["lineage"]["num_partitions"]
        for pid, m in load_manifests(out_dir).items()
        if m.get("lineage", {}).get("num_partitions") != num_partitions
    }
    if stale:
        raise RuntimeError(
            f"out_dir {out_dir!r} holds part manifests from a different "
            f"partitioning {sorted(set(stale.values()))} (current: "
            f"{num_partitions}); use a fresh out_dir"
        )


def demote_part(out_dir: str, part_id: int) -> None:
    """Remove a partition's manifest so resume recomputes it — used to back
    out a commit that later turns out to be part of a corrupted run (e.g. a
    partition that spanned exchange blocks committed a fragment per block).
    The orphaned data file is invisible: reads are manifest-driven."""
    p = part_manifest_path(out_dir, part_id)
    if os.path.exists(p):
        os.remove(p)


def load_manifests(out_dir: str) -> dict[int, dict]:
    d = manifest_dir(out_dir)
    if not os.path.isdir(d):
        return {}
    out: dict[int, dict] = {}
    for name in sorted(os.listdir(d)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            out[int(m["part_id"])] = m
    return out


def completed_parts(out_dir: str, num_partitions: int) -> set[int]:
    """Partitions safe to skip on resume.

    A partition counts as complete only if its manifest says committed, it was
    produced under the same partitioning (P must match — a different P maps
    docs differently), and its data file still exists.
    """
    done = set()
    for pid, m in load_manifests(out_dir).items():
        lineage = m.get("lineage", {})
        # singular: extraction commits; plural: the generic sink (hive
        # partition_by writes several fragments per hash partition)
        frags = lineage.get("output_fragments",
                            [lineage.get("output_fragment")])
        if (
            m.get("status") == "committed"
            and lineage.get("num_partitions") == num_partitions
            and frags
            and all(f and os.path.exists(os.path.join(out_dir, f))
                    for f in frags)
        ):
            done.add(pid)
    return done


def merge_counters(manifests: dict[int, dict]) -> dict[str, int]:
    total: dict[str, int] = {}
    for m in manifests.values():
        for k, v in m.get("counters", {}).items():
            total[k] = total.get(k, 0) + int(v)
    return total
