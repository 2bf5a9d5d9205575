"""Shared vectorized 64-bit hash finalizers (public-domain constants).

Two standard avalanche mixers live here so every hashing call site in the
engine uses ONE definition of each:

- ``mix64`` — MurmurHash3's fmix64.  Used for PLACEMENT (partition ids in
  the extraction pipeline): no additive pre-step, cheapest full-avalanche
  finalizer.
- ``splitmix64`` — SplitMix64.  Used for the Bloom double-hash family in
  decontamination: the additive constant lets one gram key derive two
  independent streams (``splitmix64(g)`` / ``splitmix64(g ^ C)``).

Both operate on uint64 numpy arrays; numpy unsigned arithmetic wraps,
which is exactly mod 2^64.  The constants are pinned — oracle SQL and the
Bloom zero-false-negative guarantee depend on bit-identical values.
"""

import hashlib

import numpy as np

SPLITMIX_C1 = np.uint64(0x9E3779B97F4A7C15)
SPLITMIX_C2 = np.uint64(0xBF58476D1CE4E5B9)
SPLITMIX_C3 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray) -> np.ndarray:
    """MurmurHash3 fmix64 over a uint64 array."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def splitmix64_mix(x: np.ndarray) -> np.ndarray:
    """SplitMix64's mixing rounds WITHOUT the additive pre-step — the
    bare avalanche used where the input is already a counter-free id
    (HyperLogLog register hashing)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= SPLITMIX_C2
    x ^= x >> np.uint64(27)
    x *= SPLITMIX_C3
    x ^= x >> np.uint64(31)
    return x


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array."""
    return splitmix64_mix((x + SPLITMIX_C1).astype(np.uint64))


def md5_bucket(key, mod: int) -> int:
    """First-8-hex-digit md5 bucket of ``str(key)`` — the ONE integer every
    md5-bridged operator (splits, shuffle order, host-graph synthesis)
    shares with its DuckDB oracle:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % mod``.
    Per-key Python md5 is the price of the oracle bridge; placement-only
    hashing uses the vectorized ``mix64`` instead."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod
