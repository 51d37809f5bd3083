"""Deterministic hashing / math helpers shared by generator, pipeline and oracle.

Everything here must be a pure function of its string arguments — no wall
clock, no platform-dependent hash (Python's builtin ``hash`` is seeded per
process and MUST NOT be used anywhere in kgre).
"""

from __future__ import annotations

import hashlib
import math


def h48(s: str) -> int:
    """48-bit deterministic hash of a string (md5 prefix)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def hunif(s: str) -> float:
    """Deterministic uniform float in [0, 1) from a string."""
    return h48(s) / float(1 << 48)


def hrange(s: str, n: int) -> int:
    """Deterministic integer in [0, n) from a string."""
    return h48(s) % n


def sigmoid(x: float) -> float:
    # clamp to avoid overflow in exp for extreme logits
    if x < -60.0:
        return 0.0
    if x > 60.0:
        return 1.0
    return 1.0 / (1.0 + math.exp(-x))


def sha256_text(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()
