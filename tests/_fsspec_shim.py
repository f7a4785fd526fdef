"""A minimal fsspec-compatible shim, vendored so FsspecBackend's three
delegations can be exercised for real in a container that doesn't ship
the fsspec package (VERDICT r11 item 5). Implements exactly the surface
`sources/storage.py`'s adapter touches — `fsspec.filesystem(scheme)`
returning an object with `open / exists / isdir / ls` — with in-memory
bytes per scheme, mirroring fsspec's own `memory://` filesystem
semantics (ls returns child PATHS; directories are implicit prefixes).
Tests install it as `sys.modules["fsspec"]` via monkeypatch; nothing in
the package imports this module.
"""

from __future__ import annotations

import io


class _ShimFS:
    def __init__(self, scheme: str):
        self.scheme = scheme
        self.store: dict[str, bytes] = {}
        self.mtimes: dict[str, float] = {}

    def _norm(self, path: str) -> str:
        pre = f"{self.scheme}://"
        p = path[len(pre):] if path.startswith(pre) else path
        return p.strip("/")

    def open(self, path: str, mode: str = "rb"):
        key = self._norm(path)
        if mode == "rb":
            if key not in self.store:
                raise FileNotFoundError(path)
            return io.BytesIO(self.store[key])
        if mode == "wb":
            fs, k = self, key

            class _W(io.BytesIO):
                def close(_self):
                    import time

                    fs.store[k] = _self.getvalue()
                    fs.mtimes[k] = time.time()
                    super().close()

            return _W()
        raise ValueError(f"shim fs supports rb/wb, not {mode!r}")

    def exists(self, path: str) -> bool:
        key = self._norm(path)
        return key in self.store or self.isdir(path)

    def isdir(self, path: str) -> bool:
        prefix = self._norm(path) + "/"
        return any(k.startswith(prefix) for k in self.store)

    def ls(self, path: str) -> list[str]:
        prefix = self._norm(path)
        prefix = prefix + "/" if prefix else ""
        names = {
            k[len(prefix):].split("/", 1)[0]
            for k in self.store
            if k.startswith(prefix)
        }
        return sorted(prefix + n for n in names)

    def modified(self, path: str):
        # fsspec's AbstractFileSystem.modified contract: datetime, or
        # raise for a missing key
        import datetime

        key = self._norm(path)
        if key not in self.store:
            raise FileNotFoundError(path)
        return datetime.datetime.fromtimestamp(
            self.mtimes.get(key, 0.0), datetime.timezone.utc
        )


_instances: dict[str, _ShimFS] = {}


def filesystem(scheme: str) -> _ShimFS:
    if scheme not in _instances:
        _instances[scheme] = _ShimFS(scheme)
    return _instances[scheme]
