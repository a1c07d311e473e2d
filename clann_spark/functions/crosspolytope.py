"""Cross-polytope LSH (H6/H7) — the reference's strongest angular hash
family, re-expressed with pure NumPy.

Reference parity:
  hash     -> libpuffinn/include/puffinn/hash/crosspolytope.hpp:121-209:
              three rounds of (random ±1 diagonal x fast Hadamard
              transform), then encode the argmax axis and its sign.
              The reference's SIMD FHT (external/ffht) becomes a
              vectorized NumPy butterfly over the Arrow batch.
  collision -> crosspolytope.hpp:10-119 estimates P[h(a)=h(b) | sim]
              by Monte-Carlo over a similarity grid; same here, seeded
              (deterministic planner inputs), linear interpolation
              between grid points.

One cross-polytope function yields log2(2*dpad) bits of entropy (axis
index + sign), so far fewer functions per band are needed than with
1-bit hyperplanes — the reason the reference defaults to it for
cosine. Codes feed the same banding/candidate machinery.
"""

from __future__ import annotations

import numpy as np


def next_pow2(d: int) -> int:
    p = 1
    while p < d:
        p <<= 1
    return p


def fht_batch(x: np.ndarray) -> np.ndarray:
    """Unnormalized fast Hadamard transform over rows of (n, d),
    d a power of two. O(d log d) per row, fully vectorized across the
    batch (the NumPy rendering of ffht's butterfly passes)."""
    n, d = x.shape
    out = x.copy()
    h = 1
    while h < d:
        out = out.reshape(n, d // (2 * h), 2, h)
        a = out[:, :, 0, :].copy()
        b = out[:, :, 1, :]
        out[:, :, 0, :] = a + b
        out[:, :, 1, :] = a - b
        out = out.reshape(n, d)
        h *= 2
    return out


def cp_diagonals(n_funcs: int, dpad: int, seed: int) -> np.ndarray:
    """(n_funcs, 3, dpad) random ±1 diagonals (crosspolytope.hpp
    sampling, seeded for determinism)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(n_funcs, 3, dpad)) * 2 - 1


def cp_codes(x: np.ndarray, diagonals: np.ndarray) -> np.ndarray:
    """(n, d) vectors -> (n, n_funcs) int codes in [0, 2*dpad).

    Per function: y = H D3 H D2 H D1 x̂ (three rotation rounds), code =
    2*argmax|y| + (y < 0). Input is L2-normalized and zero-padded to
    dpad (unit_vector.hpp padding semantics)."""
    n, d = x.shape
    n_funcs, _, dpad = diagonals.shape
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    xp = np.zeros((n, dpad))
    xp[:, :d] = xn
    codes = np.empty((n, n_funcs), dtype=np.int64)
    for f in range(n_funcs):
        y = xp
        for r in range(3):
            y = fht_batch(y * diagonals[f, r][None, :])
        idx = np.abs(y).argmax(axis=1)
        sign = (y[np.arange(n), idx] < 0).astype(np.int64)
        codes[:, f] = 2 * idx + sign
    return codes


def cp_collision_probability(
    sim: float, dim: int, n_trials: int = 4000, seed: int = 1234
) -> float:
    """H7: Monte-Carlo estimate of P[code(a) == code(b)] for a pair at
    cosine similarity `sim` in `dim` dimensions (crosspolytope.hpp:
    10-119 semantics, seeded -> deterministic)."""
    sim = min(1.0, max(-1.0, sim))
    rng = np.random.default_rng(seed)
    dpad = next_pow2(dim)
    a = rng.standard_normal((n_trials, dim))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    noise = rng.standard_normal((n_trials, dim))
    noise -= (noise * a).sum(axis=1, keepdims=True) * a
    noise /= np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-12)
    b = sim * a + np.sqrt(max(0.0, 1.0 - sim * sim)) * noise
    diag = cp_diagonals(1, dpad, seed + 1)
    ca = cp_codes(a, diag)[:, 0]
    cb = cp_codes(b, diag)[:, 0]
    return float((ca == cb).mean())


_CP_GRID = [i / 20.0 for i in range(21)]  # 0.0 .. 1.0


def cp_probability_table(dim: int, seed: int = 1234) -> list[float]:
    """Collision probability on a fixed similarity grid (cached by the
    planner; ~1 s one-off per dim)."""
    return [cp_collision_probability(s, dim, seed=seed) for s in _CP_GRID]


def cp_probability_at(sim: float, table: list[float]) -> float:
    """Linear interpolation on the grid table."""
    sim = min(1.0, max(0.0, sim))
    pos = sim * (len(table) - 1)
    lo = int(pos)
    hi = min(lo + 1, len(table) - 1)
    frac = pos - lo
    return table[lo] * (1 - frac) + table[hi] * frac
