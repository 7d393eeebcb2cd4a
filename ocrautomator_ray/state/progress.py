"""Live progress / ETA display (SURVEY.md §2.5 A2).

The reference engine kept a live console: files done, pages/s, ETA. Here the
commit record *is* the progress record: every finished partition writes a
manifest (atomic rename), so a driver-side poller that tails the manifest
directory sees progress without any hook into the data plane. That makes the
display:

- zero-overhead for the pipeline (no counters actor on the hot path),
- cluster-correct (manifests live on the shared output store, so the display
  works the same from any node at any fleet size),
- resume-aware (parts committed by earlier runs are excluded from this run's
  rate and ETA).

Polling reads only manifests it has not seen yet, so a poll is O(new parts)
plus one directory listing — cheap even at 10^5 partitions.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

from ocrautomator_ray.state.manifest import manifest_dir


class ProgressReporter:
    """Background thread rendering `parts done/total · docs/s · pages/s · ETA`.

    On a TTY the line redraws in place; otherwise one line is printed per
    poll that observed new commits (log-friendly).
    """

    def __init__(self, out_dir: str, total_parts: int,
                 skip_parts: set[int] | None = None, interval: float = 2.0,
                 stream=None) -> None:
        self.out_dir = out_dir
        self.total = total_parts
        self.skip = set(skip_parts or ())
        self.interval = interval
        self.stream = stream if stream is not None else sys.stderr
        self._seen: set[str] = set()
        self._done = 0
        self._counters: dict[str, int] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0
        self._is_tty = bool(getattr(self.stream, "isatty", lambda: False)())

    # -- polling ----------------------------------------------------------

    def _poll(self) -> bool:
        """Ingest unseen part manifests; return True if anything changed."""
        d = manifest_dir(self.out_dir)
        if not os.path.isdir(d):
            return False
        changed = False
        for name in os.listdir(d):
            if (not name.startswith("part-") or not name.endswith(".json")
                    or name in self._seen):
                continue
            self._seen.add(name)
            try:
                with open(os.path.join(d, name)) as f:
                    m = json.load(f)
            except (OSError, json.JSONDecodeError):
                # racing a concurrent rename; retry next poll
                self._seen.discard(name)
                continue
            if m.get("status") != "committed" or int(m["part_id"]) in self.skip:
                continue
            self._done += 1
            for k, v in m.get("counters", {}).items():
                self._counters[k] = self._counters.get(k, 0) + int(v)
            changed = True
        return changed

    def _render(self, final: bool = False) -> None:
        elapsed = max(time.monotonic() - self._t0, 1e-9)
        remaining = max(self.total - len(self.skip) - self._done, 0)
        if self._done and remaining and not final:
            eta = f"{elapsed / self._done * remaining:5.0f}s"
        else:
            eta = "    -"
        # render whichever volume counters this pipeline's manifests carry
        vols = [(k, self._counters[k])
                for k in ("docs", "pages_ocrd", "rows") if k in self._counters]
        vol = " | ".join(f"{k} {v:,} ({v / elapsed:,.0f}/s)" for k, v in vols) \
            or "warming up"
        line = (f"[progress] parts {self._done + len(self.skip)}/{self.total}"
                f" | {vol} | elapsed {elapsed:4.0f}s | eta {eta}")
        if self._is_tty:
            self.stream.write("\r" + line + ("\n" if final else ""))
        else:
            self.stream.write(line + "\n")
        self.stream.flush()

    def _loop(self) -> None:
        last = time.monotonic()
        while not self._stop.wait(self.interval):
            changed = self._poll()
            # TTY: redraw every poll. Logs: print on change, plus a 15 s
            # heartbeat so a long fan-in (commits land when the exchange
            # finalizes) still shows liveness.
            if changed or self._is_tty or time.monotonic() - last >= 15.0:
                self._render()
                last = time.monotonic()

    # -- lifecycle --------------------------------------------------------

    def start(self) -> "ProgressReporter":
        self._t0 = time.monotonic()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="extract-progress")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self._poll()
        self._render(final=True)

    def __enter__(self) -> "ProgressReporter":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
