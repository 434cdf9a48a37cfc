"""Deterministic ID hashing (SURVEY.md §2.6 F1, §7 risk 6).

The reference computes ``sha1(concat_ws("_", entity_tag, business keys...))``
per entity (PreProcessUtils.scala:17-91) and then resolves each hash to an
opaque internal id through an HTTP ID service (PreProcessUtils.scala:93-100)
— a collect-to-driver round trip that cannot scale. The engine's default is
a pure-Spark deterministic mapping (hash → ``{entity}_{hash}``), with the
HTTP client left as a pluggable port (pipeline/clients.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def business_key_hash(entity: str, *keys: Column | str) -> Column:
    """``sha1(concat_ws('_', entity, k1, k2, ...))``
    (reference: PreProcessUtils.scala:17-91)."""
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return F.sha1(F.concat_ws("_", F.lit(entity), *cols))


def deterministic_internal_id(entity: str, *keys: Column | str) -> Column:
    """Scale-safe replacement for the ID-server round trip: the internal id
    is derived on-executor, no driver collect, no external service."""
    return F.concat_ws("_", F.lit(entity), business_key_hash(entity, *keys))
