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

# Multiplicative mixing constants for key -> owner hashing; used
# consistently so partition/ownership decisions agree across modules that
# must colocate the same keys.  The two constants MUST differ: round-3
# shipped HASH_B = 0x9E3779B1 = 2654435761 -- the SAME golden-ratio
# constant in hex and decimal -- which made every same-operand hash
# (x*A)^(x*B) identically zero (the super-k-mer partitioner sent ALL
# records to partition 0) and every two-lane hash (hi*A)^(lo*B) symmetric
# in its lanes; the weakened mixing is the measured source of the chr1
# link-partition cap overflow.  HASH_B is now the Murmur3 fmix32 constant.
HASH_A = np.uint32(2654435761)  # Knuth golden ratio, 0x9E3779B1
HASH_B = np.uint32(0x85EBCA6B)  # Murmur3 fmix32
