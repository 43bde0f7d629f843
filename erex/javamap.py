"""Java HashMap iteration-order replica.

The reference enumerates timex pairs over
``doc.getEntities().keySet().toArray()`` (TempRelPro.java:64) — a
``java.util.HashMap`` whose iteration order is bucket order, not
insertion order.  The R1 timex algebra is order-asymmetric for the
PAST/PRESENT/FUTURE_REF era cases (TimexTimexRelationRule.java:195-245:
evaluating (REF, date) vs (date, REF) yields non-inverse results), so the
emitted T-T labels depend on that iteration order.  This module computes
it exactly for string keys:

- ``String.hashCode`` = 31-polynomial over UTF-16 units, signed 32-bit;
- ``HashMap.hash`` spreads ``h ^ (h >>> 16)``;
- slot = spread & (capacity-1) with capacity the smallest power of two
  >= 16 such that size <= 0.75*capacity (default load factor, resized
  while inserting);
- iteration walks slots 0..capacity-1, entries within a bucket in
  insertion order (Java 8 preserves relative order across resplits; we
  assume no bucket reaches the treeify threshold of 8, which holds for
  per-document entity-id sets).
"""

from __future__ import annotations


def java_string_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h


def _spread(h: int) -> int:
    return (h ^ (h >> 16)) & 0xFFFFFFFF


def hashmap_capacity(n: int) -> int:
    cap = 16
    while n > int(cap * 0.75):
        cap *= 2
    return cap


def java_hashmap_order(keys) -> list:
    """Keys in java.util.HashMap iteration order, given their insertion
    order (the iterable's own order)."""
    keys = list(keys)
    cap = hashmap_capacity(len(keys))
    buckets: dict = {}
    for k in keys:
        buckets.setdefault(_spread(java_string_hash(k)) & (cap - 1),
                           []).append(k)
    out = []
    for slot in sorted(buckets):
        out.extend(buckets[slot])
    return out
