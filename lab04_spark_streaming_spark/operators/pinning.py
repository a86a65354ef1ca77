"""Shared pin-storage constants (r14, from the r13 advisor note).

``PIN_SER`` is the storage level every **row-proportional** pinned
relation must use (see the repo-wide policy enforced by
``tests/test_pin_policy.py``): in PySpark, ``MEMORY_AND_DISK`` is the
SERIALIZED level (``deserialized=False``); the ``localCheckpoint``
default is ``MEMORY_AND_DISK_DESER``, which buffers each partition as a
vector of row objects while unrolling — 32 concurrent unroll vectors
over a ~120M-row pin is the OOM class that killed ``triangle_count``
(r11) and ``dedup_clusters`` (r12) on a 24 GB heap at the 100x tier.

Previously this constant lived as ``operators.dedup._PIN_SER`` and was
imported (underscore-private) by ~17 unrelated modules; it now has a
public home so pin policy does not couple every plan module to the
dedup operator.
"""

from __future__ import annotations

from pyspark import StorageLevel

# The SERIALIZED memory+disk level (NOT the deserialized default).
PIN_SER = StorageLevel.MEMORY_AND_DISK

# Backwards-compatible private alias; prefer PIN_SER in new code.
_PIN_SER = PIN_SER
