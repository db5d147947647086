"""Positional match kernels shared by the oracle and the distributed engine.

Pure integer algorithms (no floats), pinned against hand-computed
micro-examples in tests/test_oracle.py.

- ``near_positions``: #NEAR/n within one doc — cascading strictly-increasing
  alignment, adjacent gap <= n, emit rightmost, on match advance all location
  iterators else advance the leftmost (``/root/reference/QryEval/
  QryIopNear.java:60-179``).
- ``window_positions``: #WINDOW/n — match when max-min < n (strict), emit
  max, on match advance all, else advance every iterator at the min
  (``/root/reference/QryEval/QryIopWindow.java:55-178``).
"""

from __future__ import annotations

from typing import Sequence


def near_positions(plists: Sequence[Sequence[int]], dist: int) -> list[int]:
    its = [0] * len(plists)
    out: list[int] = []
    while True:
        if its[0] >= len(plists[0]):
            break
        left = plists[0][its[0]]
        aligned = True
        for i in range(1, len(plists)):
            while its[i] < len(plists[i]) and plists[i][its[i]] <= left:
                its[i] += 1
            if its[i] >= len(plists[i]):
                aligned = False
                break
            left = plists[i][its[i]]
        if not aligned:
            break
        ok = True
        prev = plists[0][its[0]]
        for i in range(1, len(plists)):
            cur = plists[i][its[i]]
            if cur - prev > dist:
                ok = False
                break
            prev = cur
        if ok:
            out.append(int(plists[-1][its[-1]]))
            for i in range(len(its)):
                its[i] += 1
        else:
            its[0] += 1
    return out


def window_positions(plists: Sequence[Sequence[int]], dist: int) -> list[int]:
    its = [0] * len(plists)
    out: list[int] = []
    k = len(plists)
    while all(its[i] < len(plists[i]) for i in range(k)):
        locs = [plists[i][its[i]] for i in range(k)]
        lo, hi = min(locs), max(locs)
        if hi - lo < dist:
            out.append(int(hi))
            for i in range(k):
                its[i] += 1
        else:
            for i in range(k):
                if locs[i] == lo:
                    its[i] += 1
    return out
