"""Shape-alignment helpers (TPU tiles want multiples of 8/128/256)."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(n: int, multiple: int) -> int:
    if multiple <= 0:
        raise ValueError("multiple must be positive")
    return cdiv(n, multiple) * multiple
