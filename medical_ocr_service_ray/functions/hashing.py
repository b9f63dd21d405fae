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


def horner62_batch(strings: list[str]) -> np.ndarray:
    """Vectorized token_hash62 over a batch of strings: two base-257/263
    Horner chains mod 2^31-1 over codepoints, concatenated to 62 bits.
    One utf-32 encode of the whole batch + max-length masked passes — no
    per-string Python loop. Identical to token_hash62 per element."""
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    joined = "".join(strings)
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    offs = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    m = np.uint64((1 << 31) - 1)
    b1, b2 = np.uint64(257), np.uint64(263)
    h1 = np.zeros(n, np.uint64)
    h2 = np.zeros(n, np.uint64)
    for j in range(int(lens.max(initial=0))):
        mask = lens > j
        c = cps[offs[mask] + j]
        h1[mask] = (h1[mask] * b1 + c) % m
        h2[mask] = (h2[mask] * b2 + c) % m
    return (h1 | (h2 << np.uint64(31))).astype(np.int64)


def shingles(text: str, k: int = 3) -> set[int]:
    """Hashed k-token shingles. The hash is the SQL-expressible 62-bit
    Horner chain (token_hash62 / horner62_batch) so MinHash signatures built
    from these values can be reproduced exactly by a DuckDB oracle."""
    toks = tokens(text)
    if not toks:
        return set()
    if len(toks) < k:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return set(horner62_batch(grams).tolist())


def shingle_hashes_batch(texts: list, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """``shingles()`` lifted to a BATCH: one vectorized Horner pass hashes
    every k-token gram of every text (per-doc numpy calls on tiny arrays
    were overhead-bound — q168's truth scan measured hot on exactly that).
    Returns ``(hashes, offsets)`` where ``hashes[offsets[i]:offsets[i+1]]``
    are text i's gram hashes WITH duplicates preserved — MinHash minima are
    duplicate-invariant so signature callers use the slice as-is, while
    set-semantics callers (Jaccard truth counts) np.unique their slice.
    Element-for-element identical to ``shingles()`` modulo that dedup."""
    grams: list[str] = []
    counts = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = tokens(t or "")
        if not toks:
            n = 0
        elif len(toks) < k:
            grams.append(" ".join(toks))
            n = 1
        else:
            grams.extend(" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1))
            n = len(toks) - k + 1
        counts[i + 1] = n
    return horner62_batch(grams), np.cumsum(counts)


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


def minhash_signature_arr(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``minhash_signature`` over an ndarray of shingle hashes (duplicates
    allowed — minima are duplicate-invariant, so callers can feed raw
    ``shingle_hashes_batch`` slices without a set round-trip). Identical
    output to the set variant for equal value sets."""
    if h.size == 0:
        return np.full(a.shape[0], _MAX_HASH, dtype=np.uint64)
    x = h.astype(np.uint64)
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
    return (vals & np.uint64(_MAX_HASH)).min(axis=1)


_SIMHASH_BITS = 62


def token_hash62(tok: str) -> int:
    """62-bit arithmetic token hash: two independent base-257/263 Horner
    chains over codepoints mod 2^31-1, concatenated. Deliberately
    SQL-expressible (a DuckDB oracle reproduces it with list_reduce — see
    _Q14_SQL) and collision-grade for simhash bit voting."""
    m = (1 << 31) - 1
    h1 = h2 = 0
    for c in tok:
        o = ord(c)
        h1 = (h1 * 257 + o) % m
        h2 = (h2 * 263 + o) % m
    return h1 | (h2 << 31)


def simhash64(text: str, _memo: dict = {}) -> int:
    """Simhash over unigram tokens (with multiplicity): per-token 62-bit
    arithmetic hash, per-bit +/-1 vote, bit set iff vote sum > 0. The
    module-level memo is deliberate shared state: the token vocabulary is
    tiny next to the token stream, so each worker process hashes each
    distinct token once (ST1-style bounded cache)."""
    toks = tokens(text)
    if not toks:
        return 0
    hs = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = _memo.get(t)
        if h is None:
            if len(_memo) > 500_000:  # bound worker heap
                _memo.clear()
            h = _memo[t] = token_hash62(t)
        hs[i] = h
    bits = (hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(_SIMHASH_BITS, dtype=np.uint64)).sum())


_FP_MOD = (1 << 31) - 1  # Mersenne 2^31-1: every Horner step fits uint64


def rolling_fingerprint(text: str, window: int = 8, mod_select: int = 16) -> np.ndarray:
    """Winnowing-style document fingerprint: polynomial hash (base 257,
    mod 2^31-1) over a sliding CODEPOINT window, keep hashes where
    h % mod_select == 0 (deterministic content-defined selection).

    Arithmetic is deliberately SQL-expressible — a DuckDB oracle reproduces
    it exactly with per-codepoint Horner chains (see _Q20_SQL) — and fully
    vectorized: codepoints come from one utf-32 re-encode, the Horner chain
    is `window` numpy passes over all window positions at once. Texts
    shorter than the window hash as one whole-text Horner chain (same
    arithmetic, no selection); empty/None -> no fingerprints."""
    cps = np.frombuffer((text or "").encode("utf-32-le"), dtype="<u4").astype(np.uint64)
    n = len(cps)
    mod = np.uint64(_FP_MOD)
    base = np.uint64(257)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n < window:
        h = np.uint64(0)
        for c in cps:
            h = (h * base + c) % mod
        return np.array([int(h)], dtype=np.int64)
    w = np.lib.stride_tricks.sliding_window_view(cps, window)
    acc = np.zeros(n - window + 1, dtype=np.uint64)
    for j in range(window):
        acc = (acc * base + w[:, j]) % mod
    return acc[acc % np.uint64(mod_select) == 0].astype(np.int64)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)
