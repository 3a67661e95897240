"""Interval performance metrics (the reference's --met family).

The reference emits a wide TSV of counters every N seconds
(PerfMetrics::reportInterval, centrifuge.cpp:1807-2230), merged from
per-thread structs under a mutex. Here there is one host thread driving
batched device work, so counters accumulate per batch and the emitter
fires on the same --met cadence with the same surface
(--met-file/--met-stderr/--met N). Column set: the counter families we
track natively (reads/bases/filtered from the outer loop, device search
dispatches/lane-steps, SA resolutions, reporting counts); the reference's
thread-level malloc/cache counters have no analog here.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, TextIO

COLUMNS = [
    "time", "secs", "reads", "bases", "filtered", "unfiltered",
    "paired", "unpaired",
    "batches", "lanes", "device_dispatches", "ext_searches", "ext_lanes",
    "resolve_rows", "resolve_miss_rows",
    "upload_bytes", "download_bytes", "collect_wait_secs", "device_overlap",
    "reads_classified", "reads_unclassified", "assignments",
    "memory_peak_mb",
    "reads_per_sec",
]


@dataclass
class PerfMetrics:
    reads: int = 0
    bases: int = 0
    filtered: int = 0
    paired: int = 0          # read units dispatched as pairs
    unpaired: int = 0
    batches: int = 0
    lanes: int = 0
    device_dispatches: int = 0
    ext_searches: int = 0    # extension-fixpoint device calls
    ext_lanes: int = 0       # lanes across those calls
    resolve_rows: int = 0
    resolve_miss_rows: int = 0
    upload_bytes: int = 0    # host->device batch payloads
    download_bytes: int = 0  # device->host result payloads
    collect_wait_secs: float = 0.0  # host blocked on device results
    reads_classified: int = 0
    reads_unclassified: int = 0
    assignments: int = 0

    def merge(self, other: "PerfMetrics") -> None:
        for f in self.__dataclass_fields__:
            setattr(self, f, getattr(self, f) + getattr(other, f))


def _peak_rss_mb() -> int:
    """Host peak RSS in MB (the reference's 'Overall memory peak'
    column, centrifuge.cpp:2113-2115 via gMemTally.peak())."""
    try:
        import resource
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss >> 10
    except Exception:
        return 0


class MetricsEmitter:
    """Writes the interval TSV to a file and/or stderr."""

    def __init__(self, met_file: Optional[str], met_stderr: bool,
                 interval_secs: int = 1):
        self.fh: Optional[TextIO] = open(met_file, "w") if met_file else None
        self.met_stderr = met_stderr
        self.interval = interval_secs
        self.t0 = time.time()
        self.last_emit = self.t0
        self.header_written = False

    @property
    def active(self) -> bool:
        return self.fh is not None or self.met_stderr

    def _write(self, line: str) -> None:
        if self.fh is not None:
            self.fh.write(line + "\n")
            self.fh.flush()
        if self.met_stderr:
            import sys
            print(line, file=sys.stderr)

    def maybe_emit(self, m: PerfMetrics, force: bool = False) -> None:
        if not self.active:
            return
        now = time.time()
        if not force and now - self.last_emit < self.interval:
            return
        self.last_emit = now
        if not self.header_written:
            self._write("\t".join(COLUMNS))
            self.header_written = True
        secs = now - self.t0
        # device_overlap: fraction of wall time the host was NOT blocked
        # waiting for device results -- the pipelining-efficiency measure
        overlap = 1.0 - min(m.collect_wait_secs / max(secs, 1e-9), 1.0)
        vals = [time.strftime("%H:%M:%S"), f"{secs:.1f}",
                str(m.reads), str(m.bases), str(m.filtered),
                str(m.reads - m.filtered),
                str(m.paired), str(m.unpaired),
                str(m.batches), str(m.lanes),
                str(m.device_dispatches),
                str(m.ext_searches), str(m.ext_lanes),
                str(m.resolve_rows), str(m.resolve_miss_rows),
                str(m.upload_bytes), str(m.download_bytes),
                f"{m.collect_wait_secs:.2f}", f"{overlap:.3f}",
                str(m.reads_classified), str(m.reads_unclassified),
                str(m.assignments), str(_peak_rss_mb()),
                f"{m.reads / max(secs, 1e-9):.1f}"]
        self._write("\t".join(vals))

    def close(self, m: PerfMetrics) -> None:
        if self.active:
            self.maybe_emit(m, force=True)
        if self.fh is not None:
            self.fh.close()
            self.fh = None


PER_READ_COLUMNS = ["time", "secs", "readID", "length", "filtered",
                    "classified", "assignments"]


class PerReadMetricsWriter:
    """--met-read: one metrics row per processed read (the reference
    emits a full interval row per read, centrifuge.cpp:2742-2748; the
    column set here is the adapted per-read subset of our counters)."""

    def __init__(self, path: str = "", stream: Optional[TextIO] = None):
        # bare --met-read (reference arity, centrifuge.cpp:546-547)
        # borrows the --met-file/stderr sink; a path owns its own file
        self._owns = stream is None
        self.fh = open(path, "w") if stream is None else stream
        self.fh.write("\t".join(PER_READ_COLUMNS) + "\n")
        self.t0 = time.time()

    def emit(self, read_id: str, length: int, filtered: bool,
             n_assignments: int) -> None:
        secs = time.time() - self.t0
        self.fh.write("\t".join([
            time.strftime("%H:%M:%S"), f"{secs:.2f}", read_id,
            str(length), "1" if filtered else "0",
            "1" if n_assignments > 0 else "0", str(n_assignments)]) + "\n")

    def close(self) -> None:
        if self._owns:
            self.fh.close()
