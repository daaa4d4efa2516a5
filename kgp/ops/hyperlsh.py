"""Random-hyperplane sign-bit LSH — the ONE implementation both consumers
share (ops.simsearch ANN retrieval, ops.dedup embedding-cosine near-dup).

Key format is ``"{band}:{bitstring}"`` — e.g. ``"2:1011"``.  The plane
matrix is seeded (deterministic across sessions — persisted indexes stay
probe-compatible) and cached per (dim, n, seed); the bit-string build is
fully vectorized (numpy S1→S{per} view, no per-row join loop).

The two consumers keep their historical seeds (they are independent
hash families by design — a near-dup bucket collision shouldn't imply an
ANN bucket collision); everything else is single-sourced here.
"""

from __future__ import annotations

import numpy as np

_HP_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def hyperplanes(dim: int, n: int, seed: int) -> np.ndarray:
    key = (dim, n, seed)
    if key not in _HP_CACHE:
        _HP_CACHE[key] = np.random.default_rng(seed).standard_normal((n, dim))
    return _HP_CACHE[key]


def sign_band_keys(M: np.ndarray, bands: int, n_planes: int,
                   seed: int) -> list[np.ndarray]:
    """Per-band bucket keys for a (rows, dim) matrix: list of ``bands``
    unicode arrays, each (rows,), entries ``"{b}:{per}-bit-string"``."""
    hp = hyperplanes(M.shape[1], n_planes, seed)
    bits = (M @ hp.T) > 0  # (rows, n_planes)
    per = n_planes // bands
    chars = np.where(bits, b"1", b"0").astype("S1")
    out = []
    for b in range(bands):
        seg = np.ascontiguousarray(chars[:, b * per:(b + 1) * per])
        packed = seg.view(f"S{per}").ravel().astype(f"U{per}")
        out.append(np.char.add(f"{b}:", packed))
    return out
