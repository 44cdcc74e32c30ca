"""Environment hardening.

This sandbox has fsspec but not aiohttp, so
``fsspec.implementations.http`` raises on import. Ray Data's path
resolution probes it inside ``except ModuleNotFoundError`` — but under
CONCURRENT Dataset executions (our partitioned runner overlaps shard
pipelines from driver threads) a second thread can observe the
partially-initialized module and get a plain ``ImportError: cannot
import name 'HTTPFileSystem'``, which escapes Ray's handler and kills
the read. Install a stable stub module once so every subsequent import
succeeds deterministically; nothing in a sealed sandbox can use an
HTTP filesystem anyway.
"""

from __future__ import annotations

import sys
import types


def harden_fsspec_http() -> None:
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return
    except Exception:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder; never instantiated without aiohttp
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    try:
        import fsspec.implementations as _fi

        _fi.http = mod
    except Exception:
        pass


harden_fsspec_http()
