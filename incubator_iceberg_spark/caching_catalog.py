"""CachingCatalog — wraps any catalog and memoizes loaded Table handles
(core/src/main/java/org/apache/iceberg/CachingCatalog.java analog).

Repeated ``load_table`` calls return the SAME Table instance, so its
lru-cached manifest parses and loaded metadata are shared across query
sites instead of re-read from the pointer store each time.  Mutations
through the cached handle refresh it in place (engine Tables re-read
metadata on refresh()); create/drop/rename invalidate the entry like the
reference does on those same paths.
"""

from __future__ import annotations

from collections import OrderedDict


class CachingCatalog:
    def __init__(self, inner, max_size: int = 1000):
        self.inner = inner
        self.max_size = max_size
        self._cache: OrderedDict = OrderedDict()

    # -- cached surface ----------------------------------------------------
    def load_table(self, name: str, spark=None):
        t = self._cache.get(name)
        if t is not None:
            self._cache.move_to_end(name)
            if spark is not None and t.spark is None:
                # first load had no session; honor the caller's
                t.spark = spark
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
        self._cache[name] = t
        self._cache.move_to_end(name)
        while len(self._cache) > self.max_size:
            self._cache.popitem(last=False)

    # -- passthrough -------------------------------------------------------
    def __getattr__(self, item):
        return getattr(self.inner, item)
