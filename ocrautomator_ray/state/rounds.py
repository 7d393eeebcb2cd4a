"""Per-round DRIVER-STATE checkpoints for the iterative trainers.

The engine has two classes of iterative jobs (VERDICT r4 #3):

- dataset-sized iteration state (label propagation's adjacency) — those
  commit the round's parquet through functions/dedup.py's
  ``_commit_round_data`` with an ADAPTIVE wall-time rule, because the
  commit costs a disk round-trip of the working set;
- O(k·dim)/O(R) DRIVER state (Lloyd centroids, PQ codebooks, perceptron
  weights, BPE merge tables) — those are a few kilobytes, so every round
  commits unconditionally through this module: one atomic ``.npz`` per
  round, ``os.replace``-committed, fingerprinted to the input exactly like
  the propagation checkpoints. A driver SIGKILL mid-``kmeans_fit`` then
  resumes from the last committed round instead of restarting Lloyd from
  round 0 — at 10^12 rows each round is a full pass over the table, the
  expensive thing to lose.

A checkpoint over a different input (or different hyper-parameters) must
never be resumed: the fingerprint dict embeds (path, size, mtime_ns,
params) and a mismatch wipes the directory, identical to
``dedup._prepare_checkpoint_dir``.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np


def input_fingerprint(path: str, **params) -> dict:
    """Identity of a trainer checkpoint's input: the source file's bytes
    plus every hyper-parameter that changes the round sequence."""
    st = os.stat(path)
    return {"input": path, "size": st.st_size, "mtime_ns": st.st_mtime_ns,
            **params}


class RoundState:
    """Atomic per-round snapshots of small driver state.

    Layout: ``<dir>/fingerprint.json`` plus ``<dir>/round-NNNN.npz``; a
    round file appears only complete (written to a tmp name, then
    ``os.replace``), so ``resume()`` can trust the newest file it sees and
    a kill mid-write is invisible.
    """

    def __init__(self, checkpoint_dir: str, fingerprint: dict):
        self.dir = checkpoint_dir
        os.makedirs(self.dir, exist_ok=True)
        fp_path = os.path.join(self.dir, "fingerprint.json")
        stale = True
        try:
            with open(fp_path) as f:
                stale = json.load(f) != fingerprint
        except (OSError, json.JSONDecodeError):
            pass
        if stale:
            shutil.rmtree(self.dir)
            os.makedirs(self.dir)
            tmp = fp_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(fingerprint, f)
            os.replace(tmp, fp_path)

    def _round_files(self) -> list[str]:
        return sorted(f for f in os.listdir(self.dir)
                      if f.startswith("round-") and f.endswith(".npz"))

    def resume(self) -> tuple[int, dict[str, np.ndarray] | None]:
        """(first round still to run, last committed state or None)."""
        files = self._round_files()
        if not files:
            return 0, None
        last = files[-1]
        with np.load(os.path.join(self.dir, last)) as z:
            state = {k: z[k] for k in z.files}
        return int(last[6:10]) + 1, state

    def commit(self, rnd: int, **state: np.ndarray) -> None:
        path = os.path.join(self.dir, f"round-{rnd:04d}.npz")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **state)
        os.replace(tmp, path)
