"""Markov-chain attribution: absorbing-chain conversion probability
and per-channel removal effects (Anderl, Becker, von Wangenheim &
Schumann 2016, "Mapping the customer journey").

The distributed part of the operator is the transition-count
aggregate (state space = event-type domain + start/conv/null — an
~8x8 grid at ANY fact scale); this module is the bounded driver-side
solve over that collected grid, the same envelope as the IVF k-means
fit and the IPF raking loop.
"""

from __future__ import annotations

import math


def _solve_p_conv(counts: dict[tuple[str, str], int]) -> float:
    """Absorbing-chain conversion probability from 'start'.

    v(conv) = 1, v(null) = 0, v(s) = sum_d P(s,d) * v(d) for the
    transient states; solved by Gaussian elimination on the <=8x8
    system (I - Q) v = b.
    """
    transient = sorted(
        {s for (s, _d) in counts} - {"conv", "null"}
    )
    if "start" not in transient:
        return 0.0
    idx = {s: i for i, s in enumerate(transient)}
    n = len(transient)
    totals = {s: 0 for s in transient}
    for (s, _d), c in counts.items():
        if s in totals:
            totals[s] += c
    # (I - Q) v = r, where Q is transient->transient and r is the
    # one-step probability of hitting 'conv'.
    a = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    b = [0.0] * n
    for (s, d), c in counts.items():
        if s not in idx or totals[s] == 0:
            continue
        p = c / totals[s]
        if d == "conv":
            b[idx[s]] += p
        elif d in idx:
            a[idx[s]][idx[d]] -= p
        # d == 'null' contributes nothing
    # Gaussian elimination with partial pivoting (n <= 8)
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(a[r][col]))
        if abs(a[piv][col]) < 1e-12:
            return 0.0  # degenerate chain: start cannot reach anything
        a[col], a[piv] = a[piv], a[col]
        b[col], b[piv] = b[piv], b[col]
        inv = 1.0 / a[col][col]
        for r in range(n):
            if r == col:
                continue
            f = a[r][col] * inv
            if f == 0.0:
                continue
            for c2 in range(col, n):
                a[r][c2] -= f * a[col][c2]
            b[r] -= f * b[col]
    return b[idx["start"]] / a[idx["start"]][idx["start"]]


def _without_channel(
    counts: dict[tuple[str, str], int], ch: str
) -> dict[tuple[str, str], int]:
    """Remove a channel: its outgoing edges vanish, edges INTO it are
    redirected to 'null' (the visitor leaves instead of touching the
    removed channel)."""
    out: dict[tuple[str, str], int] = {}
    for (s, d), c in counts.items():
        if s == ch:
            continue
        d2 = "null" if d == ch else d
        out[(s, d2)] = out.get((s, d2), 0) + c
    return out


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6 if x >= 0 else -(
        math.floor(-x * 1e6 + 0.5) / 1e6
    )


def removal_effects(counts: dict[tuple[str, str], int]) -> dict:
    """Full attribution: p_conv of the intact chain, removal effect
    1 - p_without/p_full per channel, and shares normalized over
    channels. All outputs rounded to 6dp (counts are exact integers,
    so the solve is deterministic)."""
    p_full = _solve_p_conv(counts)
    channels = sorted(
        {s for (s, _d) in counts} - {"start", "conv", "null"}
    )
    removal: dict[str, float] = {}
    for ch in channels:
        if p_full <= 0:
            removal[ch] = 0.0
            continue
        p_wo = _solve_p_conv(_without_channel(counts, ch))
        removal[ch] = max(0.0, 1.0 - p_wo / p_full)
    # Normalize over 6dp-snapped INTEGER micro-units, not raw doubles:
    # a raw-double sum is order-dependent at the last ulp, and the SQL
    # oracle's sum() carries no ordering guarantee — an integer sum is
    # order-free on both engines, so the share is one bit-exact division
    # (ADVICE r11). removal[ch] >= 0 by construction, so floor(x*1e6+.5)
    # is exactly _r6's grid cell.
    units = {ch: math.floor(removal[ch] * 1e6 + 0.5) for ch in channels}
    tot_u = sum(units.values())
    share = {
        ch: (units[ch] / tot_u if tot_u > 0 else 0.0) for ch in channels
    }
    return {
        "p_conv": _r6(p_full),
        "removal": {ch: units[ch] / 1e6 for ch in channels},
        "share": {ch: _r6(v) for ch, v in share.items()},
    }
