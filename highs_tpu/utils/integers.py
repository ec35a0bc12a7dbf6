"""Integer/rational utilities.

Equivalent of the reference HighsIntegers (highs/util/HighsIntegers.h):
gcd helpers and rational rounding used for integral scaling of cuts and
objectives (cut coefficients scaled to small integers improve both
numerics and the strength of integral-rounding arguments)."""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np


def gcd(a: int, b: int) -> int:
    return math.gcd(int(a), int(b))


def nearest_rational(x: float, max_denom: int = 1024
                     ) -> Tuple[int, int]:
    """Best rational approximation p/q with q <= max_denom (continued
    fractions; reference HighsIntegers::nearestInteger/denominator
    machinery)."""
    from fractions import Fraction
    f = Fraction(x).limit_denominator(max_denom)
    return f.numerator, f.denominator


def integral_scale(values: np.ndarray, deltadown: float = 1e-9,
                   deltaup: float = 1e-9, max_denom: int = 1024,
                   max_scale: float = 1e6) -> Optional[float]:
    """Smallest positive scale s such that s*values are all within
    [deltadown, deltaup] of integers (reference
    HighsIntegers::integralScale).  Returns None if no such scale with
    denominator bounds exists."""
    vals = np.asarray(values, dtype=np.float64)
    vals = vals[vals != 0.0]
    if len(vals) == 0:
        return None
    # common denominator of the rational approximations
    denom = 1
    for v in vals:
        _, q = nearest_rational(v, max_denom)
        denom = denom * q // math.gcd(denom, q)
        if denom > max_scale:
            return None
    scaled = vals * denom
    rounded = np.round(scaled)
    if np.any(np.abs(scaled - rounded) > np.maximum(deltadown, deltaup) *
              np.maximum(1.0, np.abs(rounded))):
        return None
    # reduce by the gcd of the integer values
    ints = np.abs(rounded).astype(np.int64)
    ints = ints[ints > 0]
    if len(ints) == 0:
        return None
    g = ints[0]
    for v in ints[1:]:
        g = math.gcd(int(g), int(v))
        if g == 1:
            break
    return float(denom) / float(g)
