"""IO helpers (reference ``common/utils/io.py``)."""

from __future__ import annotations

import hashlib


def get_md5(filename, chunk_size=1 << 20):
    h = hashlib.md5()
    with open(filename, "rb") as f:
        for chunk in iter(lambda: f.read(chunk_size), b""):
            h.update(chunk)
    return h.hexdigest()
