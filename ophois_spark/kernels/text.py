"""Text kernels — numpy scale-path twins of the DataFrame dedup ops.

The DataFrame formulations in ``operators.dedup`` mirror 1:1 into the
SQL oracle; these kernels compute identical values per partition in
numpy/hashlib for the 10^12-scale path (one Arrow batch per call
instead of an explode(60)×tokens row blowup).
"""

from __future__ import annotations

import hashlib

import numpy as np

SIMHASH_BITS = 60  # 15 md5 hex chars


def md5_int60(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def simhash60(tokens: list[str]) -> int:
    """Same value as operators.dedup.simhash for the same token list."""
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    idx = np.arange(SIMHASH_BITS, dtype=np.int64)
    for t in tokens:
        bits = (md5_int60(t) >> idx) & 1
        acc += bits * 2 - 1
    return int(((acc > 0).astype(np.int64) << idx).sum())


def hamming60(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def minhash_sig(shingles: set[str], n_hashes: int = 16) -> list[str]:
    """Same signatures as operators.dedup.minhash_signatures."""
    return [
        min(hashlib.md5(f"{j:02d}§{s}".encode()).hexdigest() for s in shingles)
        for j in range(n_hashes)
    ]
