"""Map builtins — the reference's BuiltinMap surface
(icicle-source/src/Icicle/Source/Query/Builtin.hs:92-99: MapKeys,
MapValues, MapCreate, MapInsert, MapDelete, MapLookup) over Spark map
columns.

Icicle maps are ordered (Data.Map): ``map_keys``/``map_values`` here
return key-sorted results so folds over them are deterministic across
engines, matching the reference's sorted iteration. Lookups are
Possibly: a missing key is null (ANSI ``element_at`` would throw —
``try_element_at`` is the faithful encoding). Size bounding
(maxMapSize) lives at the plan layer (Plan.max_group_size).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def map_create(key_type: str = "string", value_type: str = "double") -> Column:
    """Empty typed map (MapCreate)."""
    return F.create_map().cast(f"map<{key_type},{value_type}>")


def map_keys(m: Column) -> Column:
    """Sorted keys (Data.Map iteration order)."""
    return F.sort_array(F.map_keys(m))


def map_values(m: Column) -> Column:
    """Values in key order (Data.Map iteration order)."""
    keys = F.sort_array(F.map_keys(m))
    return F.transform(keys, lambda k: F.element_at(m, k))


def map_insert(m: Column, k, v) -> Column:
    """Insert-or-replace (Data.Map.insert semantics): the existing key
    is removed first so map_concat never sees a duplicate (Spark's
    mapKeyDedupPolicy defaults to EXCEPTION)."""
    k, v = _c(k), _c(v)
    cleaned = F.map_filter(m, lambda mk, _mv: mk != k)
    return F.map_concat(cleaned, F.create_map(k, v))


def map_delete(m: Column, k) -> Column:
    k = _c(k)
    return F.map_filter(m, lambda mk, _mv: mk != k)


def map_lookup(m: Column, k) -> Column:
    """Possibly lookup: missing key -> null (never an ANSI error)."""
    return F.try_element_at(m, _c(k))
