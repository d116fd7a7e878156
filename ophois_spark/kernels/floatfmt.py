"""Float → string formatting with Rust ``f64::to_string`` parity.

The reference stringifies freshly computed coordinates with Rust's
``f64::to_string()`` (shortest round-trip decimal, NEVER scientific
notation) when minting merged/discretized nodes
(reference: src/heuristics.rs:131-133, src/discretize.rs:26-27).

Python's ``repr(float)`` is also shortest-round-trip but switches to
scientific notation for |x| < 1e-4 or >= 1e16; this helper expands the
exponent so output matches Rust for every finite double.
"""

from __future__ import annotations

import math


def format_f64(x: float) -> str:
    """Shortest round-trip decimal representation, no scientific notation.

    Matches Rust ``f64::to_string()`` for all finite doubles:
    ``format_f64(48.827429699999996) == '48.827429699999996'`` and
    ``float(format_f64(x)) == x`` always.
    """
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    s = repr(float(x))
    if "e" not in s and "E" not in s:
        # Rust prints integral doubles without the trailing ".0": 1.0 → "1"
        return s[:-2] if s.endswith(".0") else s
    # expand scientific notation manually, keeping the shortest digits
    mant, _, exp_s = s.lower().partition("e")
    exp = int(exp_s)
    neg = mant.startswith("-")
    if neg:
        mant = mant[1:]
    int_part, _, frac_part = mant.partition(".")
    digits = int_part + frac_part
    point = len(int_part) + exp  # decimal point position within `digits`
    if point <= 0:
        out = "0." + "0" * (-point) + digits
    elif point >= len(digits):
        out = digits + "0" * (point - len(digits))
    else:
        out = digits[:point] + "." + digits[point:]
    out = out.rstrip("0").rstrip(".") if "." in out else out
    if out in ("", "0."):
        out = "0"
    return ("-" + out) if neg else out
