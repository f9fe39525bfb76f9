"""IO backends for dataset reads.

The reference's FileClient dispatches disk / lmdb / memcached backends
(basicsr/utils/file_client.py:5-167).  Here:
  * 'disk'      — plain filesystem reads;
  * 'pack'      — the native PackFile runtime (mmap'd flat file + sorted
    key index, C++ reader with zero-copy page-cache views — the lmdb role
    without the lmdb dependency; see native/packfile.cpp);
  * 'memcached' — a shared byte cache in front of disk reads via a stock
    memcached daemon (the reference's MemcachedBackend role,
    basicsr/utils/file_client.py:29-55, minus its proprietary ``mc``
    dependency — see data/memcached.py).  Reads are cache-first with disk
    read-through: a miss falls back to the filesystem and populates the
    cache, so the backend works from a cold daemon (the reference requires
    an externally pre-warmed cluster and hard-fails otherwise).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from .packfile import PackReader

__all__ = ["FileClient"]


class FileClient:
    def __init__(self, backend: str = "disk", pack_path: str | Path | None = None,
                 server: str = "127.0.0.1:11211"):
        if backend not in ("disk", "pack", "memcached"):
            raise ValueError(f"unknown FileClient backend: {backend!r} "
                             "(supported: disk, pack, memcached)")
        self.backend = backend
        self.pack = PackReader(pack_path) if backend == "pack" else None
        self.cache = None
        if backend == "memcached":
            from .memcached import MemcachedClient

            self.cache = MemcachedClient(server)

    def keys(self) -> list[str]:
        if self.pack is None:
            raise ValueError("keys() only makes sense for the pack backend")
        return self.pack.keys()

    def get(self, key: str | Path) -> bytes:
        if self.pack is not None:
            return self.pack.get(str(key))
        if self.cache is not None:
            hit = self.cache.get(str(key))
            if hit is not None:
                return hit
            data = Path(key).read_bytes()
            self.cache.set(str(key), data)  # best-effort; over-limit ignored
            return data
        return Path(key).read_bytes()

    def imread(self, key: str | Path, chn: str = "rgb",
               dtype: str = "float32") -> np.ndarray:
        """Decode an image blob — same contract as utils.image_io.imread."""
        buf = np.frombuffer(self.get(key), np.uint8)
        im = cv2.imdecode(buf, cv2.IMREAD_UNCHANGED)
        if im is None:
            raise IOError(f"cannot decode image: {key}")
        if chn == "rgb":
            if im.ndim == 2:
                im = cv2.cvtColor(im, cv2.COLOR_GRAY2RGB)
            else:
                im = cv2.cvtColor(im[..., :3], cv2.COLOR_BGR2RGB)
        elif chn == "gray" and im.ndim == 3:
            im = cv2.cvtColor(im[..., :3], cv2.COLOR_BGR2GRAY)
        if dtype.startswith("float"):
            im = im.astype(dtype) / 255.0
        return im
