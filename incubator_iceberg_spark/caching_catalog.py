"""CachingCatalog — wraps any catalog and memoizes loaded Table handles
(core/src/main/java/org/apache/iceberg/CachingCatalog.java analog).

Repeated ``load_table`` calls return the SAME Table instance, so its
lru-cached manifest parses and loaded metadata are shared across query
sites instead of re-read from the pointer store each time.  Mutations
through the cached handle refresh it in place (engine Tables re-read
metadata on refresh()); create/drop/rename invalidate the entry like the
reference does on those same paths.

Staleness contract: with the default ``expiration_interval_s=None`` a
cached handle is served as-is indefinitely, so commits made through a
DIFFERENT handle or process are invisible until ``invalidate``/
``invalidate_all`` or the handle's own ``refresh()`` — exactly the
reference's behavior with cache expiration disabled.  Pass
``expiration_interval_s`` (CatalogProperties.CACHE_EXPIRATION_INTERVAL_MS
analog) to bound staleness: an entry older than the interval is
refresh()ed in place on its next hit, picking up external commits while
still reusing the handle's parsed-manifest caches.
"""

from __future__ import annotations

import time
from collections import OrderedDict


class CachingCatalog:
    def __init__(self, inner, max_size: int = 1000,
                 expiration_interval_s: float | None = None):
        self.inner = inner
        self.max_size = max_size
        self.expiration_interval_s = expiration_interval_s
        self._cache: OrderedDict = OrderedDict()  # name -> (table, loaded_at)

    # -- cached surface ----------------------------------------------------
    def load_table(self, name: str, spark=None):
        hit = self._cache.get(name)
        if hit is not None:
            t, loaded_at = hit
            self._cache.move_to_end(name)
            if spark is not None and t.spark is None:
                # first load had no session; honor the caller's
                t.spark = spark
            if (self.expiration_interval_s is not None
                    and time.monotonic() - loaded_at > self.expiration_interval_s):
                t.refresh()
                self._cache[name] = (t, time.monotonic())
            return t
        t = self.inner.load_table(name, spark=spark) if spark is not None \
            else self.inner.load_table(name)
        self._put(name, t)
        return t

    def create_table(self, name: str, *a, **kw):
        t = self.inner.create_table(name, *a, **kw)
        self._put(name, t)
        return t

    def create_table_as_select(self, name: str, *a, **kw):
        t = self.inner.create_table_as_select(name, *a, **kw)
        self._put(name, t)
        return t

    def drop_table(self, name: str, *a, **kw):
        self.invalidate(name)
        return self.inner.drop_table(name, *a, **kw)

    def rename_table(self, name: str, new_name: str):
        self.invalidate(name)
        self.invalidate(new_name)
        return self.inner.rename_table(name, new_name)

    # -- cache management --------------------------------------------------
    def invalidate(self, name: str) -> None:
        self._cache.pop(name, None)

    def invalidate_all(self) -> None:
        self._cache.clear()

    def _put(self, name, t) -> None:
        self._cache[name] = (t, time.monotonic())
        self._cache.move_to_end(name)
        while len(self._cache) > self.max_size:
            self._cache.popitem(last=False)

    # -- passthrough -------------------------------------------------------
    def __getattr__(self, item):
        return getattr(self.inner, item)
