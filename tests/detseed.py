"""Deterministic fuzz seeds.

Python's ``hash()`` on strings is salted per process, so seeding an RNG
from it fuzzes a DIFFERENT configuration stream on every run — green
runs prove nothing about the configs another run will draw (a real
``ref.remap`` counterexample hid behind this for a whole round).
``seed(...)`` derives the seed from ``zlib.crc32`` of the repr instead:
stable across processes, interpreters and PYTHONHASHSEED.
"""

import zlib


def seed(*parts) -> int:
    return zlib.crc32(repr(parts).encode()) % 2**31
