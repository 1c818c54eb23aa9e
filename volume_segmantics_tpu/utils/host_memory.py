"""Host-side allocator tuning for large-volume workflows.

Volume prediction and training churn through multi-hundred-MB host
buffers (downloaded label/probability volumes, unpack outputs, HDF5
staging). glibc serves allocations above its mmap threshold (max 32 MB)
with a fresh mmap and gives the pages straight back to the kernel on
free — so EVERY prediction call pays the kernel's first-touch page-fault
cost for its full output footprint again.

On bare metal that cost is small; on the virtualised hosts this
framework targets it is not. Measured on the attached build/bench VM
(Firecracker-style lazy memory provisioning): first touch of freshly
provisioned anonymous memory sustains only ~10-13 MB/s — ~12 s for one
512-cube uint8 volume — while touching recycled pages runs at >5 GB/s.
The stage profile that motivated this module showed a 512-cube 12-way
prediction spending ~5 s (of 11.4 s total) in page faults alone.

`tune_malloc_for_large_buffers()` raises glibc's mmap and trim
thresholds so big blocks live on the main arena and freed memory stays
in-process for reuse. Fault cost is then paid once per high-water mark,
not once per call (measured: repeat 134 MB alloc+fill drops from ~12 s
to ~0.1 s). The trade-off — RSS parks at the high-water mark — is the
right default for a throughput-first framework; set VOLSEG_MALLOC_TUNE=0
to keep glibc's defaults.
"""

import ctypes
import logging
import os

# glibc mallopt parameter numbers (bits/mman.h / malloc.h; stable ABI).
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_applied = None


def tune_malloc_for_large_buffers() -> bool:
    """Idempotently raise glibc's mmap/trim thresholds (see module doc).

    Returns True when the tuning is active. Safe no-op on non-glibc
    platforms and when VOLSEG_MALLOC_TUNE=0.
    """
    global _applied
    if _applied is not None:
        return _applied
    if os.environ.get("VOLSEG_MALLOC_TUNE", "1") == "0":
        _applied = False
        return False
    try:
        libc = ctypes.CDLL("libc.so.6")
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)) and bool(
            libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        )
    except Exception:  # pragma: no cover - non-glibc platform
        ok = False
    if ok:
        logging.debug(
            "glibc malloc tuned for large-buffer reuse "
            "(mmap/trim thresholds raised)."
        )
    _applied = ok
    return ok
