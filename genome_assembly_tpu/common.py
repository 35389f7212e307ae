"""Shared scalar constants.

These are numpy scalars ON PURPOSE: a module-level ``jnp`` scalar would
initialize the default (TPU) backend at import time -- before any CLI
``--cpu`` switch -- and its constant-fetch during later jit lowering can
block behind an unrelated process on the TPU relay (observed as an
indefinite CLI hang).  Keep anything importable at module scope numpy.
"""

from __future__ import annotations

import numpy as np

# Sentinel key lane value: real packed k-mers/m-mers use < 2*k <= 62 bits
# per lane pair (hi < 2^30 for k=31), so all-ones marks invalid/padding and
# sorts after every real record.
SENTINEL = np.uint32(0xFFFFFFFF)

# Multiplicative mixing constants (Knuth / golden ratio) for key -> owner
# hashing; used consistently so partition/ownership decisions agree across
# modules that must colocate the same keys.
HASH_A = np.uint32(2654435761)
HASH_B = np.uint32(0x9E3779B1)
