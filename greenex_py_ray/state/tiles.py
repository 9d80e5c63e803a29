"""Per-actor raster tile cache.

The reference loads whole rasters into driver memory and clips per row
(`/root/reference/GreenExp/availability.py:209-216`,
`visibility.py:113-216`).  At 100 TB that is impossible; here raster
data lives in a partitioned tile store (parquet, one row per 256×256
tile, small row groups for predicate pushdown) and each worker actor
holds an LRU cache of decoded tiles.  Tiles are fetched lazily by
``(band, tix, tiy)``; batches arrive grouped/sorted by tile id so the
working set per actor stays within ``capacity``.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq

from ..sources import synth


class TileStore:
    """LRU-cached reader over the tile parquet store.

    Thread-compatible within one actor (Ray Data calls ``__call__``
    serially per actor).  ``capacity`` is in tiles (~0.5 MB each).
    """

    def __init__(self, root: str, capacity: int = 256):
        self.root = root
        self.capacity = capacity
        self._cache: OrderedDict[tuple[str, int, int], np.ndarray] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, band: str, tix: int, tiy: int) -> "np.ndarray | None":
        """Decoded tile, or None if the tile does not exist (AoIs crossing
        the raster edge use only the intersecting part — the reference
        warns and proceeds, availability.py:282-286)."""
        key = (band, int(tix), int(tiy))
        if key in self._cache:
            self._cache.move_to_end(key)
            self.hits += 1
            return self._cache[key]
        self.misses += 1
        arr = self._read(band, tix, tiy)
        self._cache[key] = arr
        if len(self._cache) > self.capacity:
            self._cache.popitem(last=False)
        return arr

    def _read(self, band: str, tix: int, tiy: int) -> np.ndarray:
        path = os.path.join(self.root, f"tiles_{band}.parquet")
        t = pq.read_table(
            path,
            columns=["w", "h", "data"],
            filters=[("tix", "=", int(tix)), ("tiy", "=", int(tiy))],
        )
        if t.num_rows == 0:
            return None
        w = t.column("w")[0].as_py()
        h = t.column("h")[0].as_py()
        buf = t.column("data")[0].as_py()
        dtype = synth.BAND_DTYPE[band]
        return np.frombuffer(buf, dtype=dtype).reshape(h, w)
