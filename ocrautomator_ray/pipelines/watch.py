"""Incremental micro-batch ingestion ("watch" mode, SURVEY.md §2.1 S5
extension): keep extracting as the input directory GROWS.

Partition resume (S5) is scoped to one input snapshot — a committed
partition is never recomputed, and new documents hash into *every*
partition, so partition manifests cannot express "these docs arrived
later". The watch runner uses the other natural unit of incrementality:
input FRAGMENTS (files). Each round:

1. list the input directory (an object-store listing — cheap at any scale),
2. diff against the fragment sets recorded in ``watch_manifest.json``,
3. run the normal extraction pipeline over ONLY the new fragments into a
   fresh epoch directory (``out/epoch-NNNNN/`` — a standard resumable
   pipeline output with its own partition manifests),
4. atomically commit the epoch's fragment list to the watch manifest.

Crash-safety: the epoch is recorded as ``pending`` (with its fragment list)
BEFORE the pipeline runs and flipped to ``committed`` after, both via
tmp+rename. A crash mid-epoch therefore leaves a pending record; the next
round re-runs that exact fragment set first, and the epoch's own partition
resume makes the re-run incremental. The overall output is the union of
committed epochs (``read_watch_output``).

Fragment identity is (path, size, mtime_ns), not path alone: a file
overwritten or appended AFTER its epoch committed is detected (skipped with
a loud warning — re-ingesting it would duplicate its old rows), and a
pending epoch whose fragment has changed or vanished fails with a clear
error instead of wedging recovery behind an opaque read error every round.
Manifests written before stats were recorded (bare path strings) still load;
their fragments just can't be mutation-checked.

Scale shape: state is O(input files) in one JSON (at billions of files,
shard the manifest by listing prefix); each epoch is an independent bounded
pipeline run, so a watch deployment is just this loop on the driver node.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import ray.data as rd

from ocrautomator_ray.pipelines.extract import (
    PipelineConfig,
    read_output,
    run_extraction,
)

_MANIFEST = "watch_manifest.json"
_FRAGMENT_SUFFIXES = (".parquet", ".jsonl", ".json")


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, _MANIFEST)


def _load_manifest(out_dir: str) -> dict[str, Any]:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return {"epochs": []}
    with open(path) as f:
        return json.load(f)


def _store_manifest(out_dir: str, manifest: dict[str, Any]) -> None:
    path = _manifest_path(out_dir)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())       # data durable before the rename is
    os.replace(tmp, path)          # atomic on POSIX


def list_fragments(input_dir: str) -> list[str]:
    """Sorted fragment files under ``input_dir`` (non-recursive: one level,
    the layout every writer in this repo produces)."""
    if os.path.isfile(input_dir):
        return [input_dir]
    return sorted(
        os.path.join(input_dir, name)
        for name in os.listdir(input_dir)
        if name.endswith(_FRAGMENT_SUFFIXES) and not name.startswith(".")
    )


def _frag_entry(path: str) -> dict[str, Any]:
    st = os.stat(path)
    return {"path": path, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def _frag_path(frag: Any) -> str:
    """Fragment record → path (bare strings = pre-stat manifest format)."""
    return frag if isinstance(frag, str) else frag["path"]


def _frag_drift(frag: Any) -> str | None:
    """None if the fragment is intact (or has no recorded stats to check),
    else 'vanished' or 'mutated (size A->B, mtime changed)'."""
    path = _frag_path(frag)
    if not os.path.exists(path):
        return "vanished"
    if isinstance(frag, str):
        return None  # legacy record: no stats to compare
    st = os.stat(path)
    if st.st_size != frag["size"] or st.st_mtime_ns != frag["mtime_ns"]:
        return (f"mutated (size {frag['size']}->{st.st_size}, "
                f"mtime_ns {frag['mtime_ns']}->{st.st_mtime_ns})")
    return None


def _read_fragments(paths: list[str]) -> rd.Dataset:
    # a round may pick up mixed formats — read each family with its own
    # reader and union (one wrong reader would wedge the epoch forever:
    # pending epochs re-run first, so a deterministic crash blocks ingestion)
    js = [p for p in paths if p.endswith((".jsonl", ".json"))]
    pq_paths = [p for p in paths if p not in js]
    parts = []
    if pq_paths:
        parts.append(rd.read_parquet(pq_paths))
    if js:
        parts.append(rd.read_json(js))
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]


def run_watch(
    input_dir: str,
    out_dir: str,
    rounds: int | None = 1,
    poll_interval: float = 5.0,
    **cfg_kwargs: Any,
) -> dict[str, Any]:
    """Run ``rounds`` incremental rounds (None = loop forever); returns a
    summary of this invocation. ``cfg_kwargs`` are PipelineConfig fields
    applied to every epoch (num_partitions, work_factor, concurrency, ...).
    """
    import warnings

    os.makedirs(out_dir, exist_ok=True)
    epochs_run, docs_done = 0, 0
    mutated_warned: set[str] = set()
    rnd = 0
    while rounds is None or rnd < rounds:
        rnd += 1
        manifest = _load_manifest(out_dir)
        seen: set[str] = set()
        pending = None
        for ep in manifest["epochs"]:
            seen.update(_frag_path(f) for f in ep["fragments"])
            if ep["status"] == "pending" and pending is None:
                pending = ep
            elif ep["status"] == "committed":
                # a committed fragment that changed on disk would silently
                # never re-ingest its new content — surface it loudly (once),
                # but do NOT re-ingest: that would duplicate its old rows
                for f in ep["fragments"]:
                    drift = _frag_drift(f)
                    if drift and _frag_path(f) not in mutated_warned:
                        mutated_warned.add(_frag_path(f))
                        warnings.warn(
                            f"watch: committed fragment {_frag_path(f)!r} "
                            f"{drift} after epoch {ep['epoch']} ingested it; "
                            "its changes are NOT re-ingested (write new "
                            "fragments instead of mutating old ones)",
                            stacklevel=2)
        if pending is not None:
            # crashed mid-epoch last time: finish that exact fragment set
            # (the epoch dir's partition manifests make the re-run cheap) —
            # but only if the fragments are still byte-identical; a changed
            # or deleted input would wedge recovery with an opaque read
            # error (or silently commit different rows) every round
            broken = {_frag_path(f): d for f in pending["fragments"]
                      if (d := _frag_drift(f))}
            if broken:
                raise RuntimeError(
                    f"watch: pending epoch {pending['epoch']} cannot be "
                    f"replayed — its input fragments changed since the epoch "
                    f"was recorded: {broken}. Restore the files, or remove "
                    f"the pending entry from {_manifest_path(out_dir)!r} to "
                    "abandon the epoch.")
            epoch, frags = pending["epoch"], pending["fragments"]
        else:
            new_paths = [p for p in list_fragments(input_dir) if p not in seen]
            if not new_paths:
                # idle: honor the poll interval whenever another scan
                # follows (finite-round runs would otherwise busy-spin
                # through their remaining rounds in milliseconds)
                if rounds is None or rnd < rounds:
                    time.sleep(poll_interval)
                continue
            frags = [_frag_entry(p) for p in new_paths]
            epoch = len(manifest["epochs"])
            manifest["epochs"].append(
                {"epoch": epoch, "fragments": frags, "status": "pending"}
            )
            _store_manifest(out_dir, manifest)

        epoch_dir = os.path.join(out_dir, f"epoch-{epoch:05d}")
        cfg = PipelineConfig(out_dir=epoch_dir,
                             input_desc=f"{input_dir} [{len(frags)} new]",
                             **cfg_kwargs)
        summary = run_extraction(_read_fragments([_frag_path(f) for f in frags]),
                                 cfg)

        manifest = _load_manifest(out_dir)
        for ep in manifest["epochs"]:
            if ep["epoch"] == epoch:
                ep["status"] = "committed"
        _store_manifest(out_dir, manifest)
        epochs_run += 1
        docs_done += summary.get("counters", {}).get("docs", 0)

    return {"epochs_run": epochs_run, "docs": docs_done,
            "total_epochs": len(_load_manifest(out_dir)["epochs"])}


def read_watch_output(out_dir: str) -> rd.Dataset:
    """Union of every committed epoch's document table."""
    manifest = _load_manifest(out_dir)
    parts = [
        read_output(os.path.join(out_dir, f"epoch-{ep['epoch']:05d}"))
        for ep in manifest["epochs"]
        if ep["status"] == "committed"
    ]
    if not parts:
        raise FileNotFoundError(f"no committed epochs in {out_dir!r}")
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
