"""Small shared helpers."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def ceil_to(n: int, m: int) -> int:
    return cdiv(n, m) * m
