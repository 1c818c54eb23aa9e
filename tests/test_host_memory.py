"""Unit tests for utils/host_memory.py (glibc large-buffer tuning)."""

import subprocess
import sys

from volume_segmantics_tpu.utils import host_memory


def test_tune_is_idempotent_and_reports_status():
    first = host_memory.tune_malloc_for_large_buffers()
    assert isinstance(first, bool)
    # Second call returns the cached outcome without re-tuning.
    assert host_memory.tune_malloc_for_large_buffers() is first


def test_opt_out_env_disables_tuning():
    # Fresh process: the module caches its outcome globally.
    code = (
        "from volume_segmantics_tpu.utils import host_memory\n"
        "assert host_memory.tune_malloc_for_large_buffers() is False\n"
        "assert host_memory._applied is False\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env={"VOLSEG_MALLOC_TUNE": "0", "PYTHONPATH": "/root/repo",
             "PATH": "/usr/bin:/bin"},
    )
    assert r.returncode == 0, r.stderr


def test_tuning_applies_on_glibc():
    # The build/bench hosts are glibc Linux; the tuning must take there.
    import ctypes

    try:
        ctypes.CDLL("libc.so.6")
    except OSError:
        return  # non-glibc platform: nothing to assert
    assert host_memory.tune_malloc_for_large_buffers() is True
