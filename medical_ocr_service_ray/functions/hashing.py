"""Content hashing / fingerprinting utilities.

- sha256 content hash: dedup / idempotency key
  (reference: src/services/gpt-vision.service.js:22; schema UNIQUE(archivo_hash)
  database/schema_matching.sql:131)
- simhash / minhash / rolling fingerprint: scale additions for near-dedup
  (no counterpart in the reference; standard public algorithms)
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-token shingles."""
    toks = tokens(text)
    if len(toks) < k:
        return {hash64(" ".join(toks))} if toks else set()
    return {hash64(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)}


def hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash64_bytes(b: bytes) -> int:
    """Deterministic 64-bit hash of raw bytes (blake2b). Used for LSH band
    keys — unlike Python's hash(tuple), stable across interpreter versions."""
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big")


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic universal-hash parameters a*x+b mod p."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_set: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """uint32 signature of length num_perm; all-max for empty sets."""
    if not shingle_set:
        return np.full(a.shape[0], _MAX_HASH, dtype=np.uint64)
    x = np.fromiter(shingle_set, dtype=np.uint64, count=len(shingle_set))
    # (a*x + b) mod p, folded to 32 bits; object->uint64 overflow is fine (mod 2^64 universe)
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return (vals & np.uint64(_MAX_HASH)).min(axis=1)


def simhash64(text: str) -> int:
    """64-bit simhash over unigram tokens."""
    toks = tokens(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = hash64(t)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def rolling_fingerprint(text: str, window: int = 8, mod_select: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hash over a
    sliding char window, keep hashes where h % mod_select == 0 (deterministic
    content-defined selection)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < window:
        return [hash64(text)] if text else []
    base, mod = 257, _MERSENNE
    power = pow(base, window - 1, mod)
    h = 0
    out = []
    for i, byte in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * power) % mod
        h = (h * base + byte) % mod
        if i >= window - 1 and h % mod_select == 0:
            out.append(h)
    return out


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)
