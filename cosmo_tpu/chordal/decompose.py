"""Chordal decomposition orchestration (host side).

Reference: src/chordal_decomposition/chordal_decomposition.jl.

Stage placeholder: returns None (no decomposition) until the full
trees/merging/transformation pipeline lands.
"""
from __future__ import annotations


def decompose(P, q, A, b, sets, settings):
    return None


def reverse(chordal_info, x, y, s, settings):
    return x, y, s
