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


def simhash60_batch(token_lists: list[list[str]]) -> list[int]:
    """Batch twin of ``simhash60`` (pinned equal by tests) with a
    shared token→±1-vector cache: each distinct token in the batch is
    md5-hashed once, and repeated tokens inside a document fold in as
    count × vector. Real text repeats tokens heavily (stopwords), so
    this cuts the md5 calls by the corpus' repetition factor."""
    idx = np.arange(SIMHASH_BITS, dtype=np.int64)
    cache: dict[str, np.ndarray] = {}
    out: list[int] = []
    for tokens in token_lists:
        acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
        counts: dict[str, int] = {}
        for t in tokens:
            counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            v = cache.get(t)
            if v is None:
                v = ((md5_int60(t) >> idx) & 1) * 2 - 1
                cache[t] = v
            acc += c * v
        out.append(int(((acc > 0).astype(np.int64) << idx).sum()))
    return out


def hamming60(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


MINHASH_P = 2147483647  # 2^31 − 1, prime — THE definition (dedup imports it)


def minhash_affine(j: int) -> tuple[int, int]:
    """Deterministic (a_j, b_j) for MinHash permutation j; a_j ≠ 0
    since P is prime, P ∤ 1103515245 and j+1 < P."""
    return (1103515245 * (j + 1)) % MINHASH_P, (12345 + 777767777 * j) % MINHASH_P


def minhash_sig(shingles: set[str], n_hashes: int = 16) -> list[int]:
    """Same signatures as operators.dedup.minhash_signatures: one md5
    per shingle (first 7 hex chars → 28-bit int), permutation j is the
    affine bijection (a_j·h + b_j) mod 2^31−1."""
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:7], 16) for s in shingles]
    out = []
    for j in range(n_hashes):
        a, b = minhash_affine(j)
        out.append(min((a * h + b) % MINHASH_P for h in hs))
    return out
