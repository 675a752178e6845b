"""Host-memory diagnostics for long training runs.

The r4 converge runs exposed unbounded host RSS growth (~1.5-2.3 GB/epoch,
ROADMAP "Known issue (r4)").  This module gives the trainer a cheap per-epoch
memory snapshot that *discriminates between the suspects* instead of only
measuring the symptom:

* ``rss_mb`` / ``hwm_mb``   — the symptom (/proc/self/status).
* ``heap_mb``               — RSS of the [heap] segment (glibc main arena).
* ``anon_mb`` / ``file_mb`` — anonymous vs file-backed RSS (/proc/self/smaps).
* mallinfo2                 — ``uord_mb`` (live malloc'd bytes): grows => a
  real allocation leak (python or native); ``ford_mb`` + ``keep_mb`` (freed
  but not returned to the OS): grows => glibc arena fragmentation /
  dynamic-mmap-threshold ratchet; ``hblk_mb`` (mmap'd by malloc).
* ``live_arrays``           — len(jax.live_arrays()): grows => leaked jax
  buffer references (donation/copy retention).

If RSS grows while *all* malloc numbers stay flat, the growth is mmap'd
outside malloc — i.e. the TPU runtime / tunnel client's transfer buffers.

``maybe_trim()`` optionally runs ``malloc_trim(0)`` per epoch
(``FTX_MALLOC_TRIM=1``) — the cheap mitigation for the fragmentation case.

No reference equivalent (the reference has no long-run memory tooling); this
is operational hardening for the 100-epoch recipes
(reference ``configs/semantic_kitti/middlefusion.yaml`` MAX_EPOCH).
"""

from __future__ import annotations

import ctypes
import os


class _MallInfo2(ctypes.Structure):
    _fields_ = [(n, ctypes.c_size_t) for n in (
        "arena", "ordblks", "smblks", "hblks", "hblkhd",
        "usmblks", "fsmblks", "uordblks", "fordblks", "keepcost")]


_libc = None


def _get_libc():
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        except OSError:          # pragma: no cover - non-glibc platform
            _libc = False
    return _libc


def _mb(kb_or_b, unit="kB"):
    return round(kb_or_b / (1024.0 if unit == "kB" else 1024.0 ** 2), 1)


def rss_mb():
    """Current VmRSS in MB (0.0 if /proc is unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return _mb(int(line.split()[1]))
    except OSError:              # pragma: no cover
        pass
    return 0.0


def snapshot(include_jax=True):
    """One diagnostic snapshot as a flat dict of MB-valued floats."""
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    out["rss_mb"] = _mb(int(line.split()[1]))
                elif line.startswith("VmHWM:"):
                    out["hwm_mb"] = _mb(int(line.split()[1]))
    except OSError:              # pragma: no cover
        pass

    # smaps walk: [heap] vs anonymous vs file-backed RSS.  ~5-15 ms for a
    # process this size — fine at per-epoch cadence.
    heap = anon = filem = 0
    try:
        with open("/proc/self/smaps") as f:
            cur_is_heap = cur_is_file = False
            for line in f:
                first = line.split(" ", 1)[0]
                if "-" in first and not first.endswith(":"):  # region header
                    fields = line.split()
                    path = fields[5] if len(fields) >= 6 else ""
                    cur_is_heap = path == "[heap]"
                    cur_is_file = path.startswith("/")
                elif line.startswith("Rss:"):
                    kb = int(line.split()[1])
                    if cur_is_heap:
                        heap += kb
                    elif cur_is_file:
                        filem += kb
                    else:
                        anon += kb
        out["heap_mb"] = _mb(heap)
        out["anon_mb"] = _mb(anon)
        out["file_mb"] = _mb(filem)
    except OSError:              # pragma: no cover
        pass

    libc = _get_libc()
    if libc:
        try:
            fn = libc.mallinfo2
            fn.restype = _MallInfo2
            mi = fn()
            out["uord_mb"] = _mb(mi.uordblks, "B")
            out["ford_mb"] = _mb(mi.fordblks, "B")
            out["keep_mb"] = _mb(mi.keepcost, "B")
            out["hblk_mb"] = _mb(mi.hblkhd, "B")
            out["arena_mb"] = _mb(mi.arena, "B")
        except AttributeError:   # pragma: no cover - old glibc
            pass

    if include_jax:
        try:
            import jax
            out["live_arrays"] = len(jax.live_arrays())
        except Exception:        # pragma: no cover
            pass
    return out


def format_snapshot(snap):
    return "  ".join(f"{k}={v}" for k, v in snap.items())


def trim():
    """malloc_trim(0): hand freed-but-held arena pages back to the OS.
    Returns True if pages were released."""
    libc = _get_libc()
    if not libc:                 # pragma: no cover
        return False
    try:
        return bool(libc.malloc_trim(0))
    except AttributeError:       # pragma: no cover
        return False


def maybe_trim():
    """Per-epoch trim hook — ON by default (measured: returns 2-3 GB/epoch
    of compile scratch + checkpoint-copy pages glibc otherwise holds
    forever, ROADMAP r5 leak diagnosis); FTX_MALLOC_TRIM=0 disables."""
    if os.environ.get("FTX_MALLOC_TRIM", "1") != "0":
        return trim()
    return False


# --------------------------------------------------------------------- #
# Python-allocation attribution (FTX_MEMDIAG_TRACE=1): discriminates a
# python-object leak (tracemalloc total grows with RSS) from a native one
# (tracemalloc flat while mallinfo's live bytes grow) and names the top
# growing allocation sites.
_trace_last = None


def trace_report(top=5):
    """Returns a one-line tracemalloc report (delta vs last call), or ""
    when FTX_MEMDIAG_TRACE is off.  Starts tracing on first call."""
    global _trace_last
    if os.environ.get("FTX_MEMDIAG_TRACE", "") != "1":
        return ""
    import tracemalloc
    if not tracemalloc.is_tracing():
        tracemalloc.start(8)
        _trace_last = tracemalloc.take_snapshot()
        cur, peak = tracemalloc.get_traced_memory()
        return f"pytrace started (current {cur/1e6:.0f} MB)"
    snap = tracemalloc.take_snapshot()
    cur, peak = tracemalloc.get_traced_memory()
    stats = snap.compare_to(_trace_last, "lineno")[:top]
    _trace_last = snap
    tops = "; ".join(
        f"{s.traceback[0].filename.split('/')[-1]}:"
        f"{s.traceback[0].lineno} {s.size_diff/1e6:+.1f}MB" for s in stats)
    return f"pytrace current {cur/1e6:.0f} MB, top growth: {tops}"
