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


def near2_batch(
    pa_flat, pa_off, pb_flat, pb_off, dist: int
):
    """Vectorized 2-arg #NEAR over MANY docs at once.

    The reference's cascaded alignment (QryIopNear.java:60-179) unrolled
    into masked steps — each iteration advances ONE pointer per active doc
    (the inner advance-past-left while becomes successive steps), so the
    match sequence per doc is byte-identical to :func:`near_positions`
    (fuzz-pinned).  Iteration count = max per-doc pointer advances
    (~tf_a+tf_b), each a handful of vector ops over the active docs — the
    per-doc Python loop this replaces cost ~5s/query at 7.5M docs.

    Inputs are flat position arrays + per-doc offset arrays (len n+1).
    Returns ``(tfs int64[n], docs_emit, pos_emit)`` where the emit arrays
    hold one entry per match in (doc-major, position-ascending) order.
    """
    import numpy as np

    n = len(pa_off) - 1
    ia = pa_off[:-1].astype(np.int64).copy()
    ib = pb_off[:-1].astype(np.int64).copy()
    ea = pa_off[1:].astype(np.int64)
    eb = pb_off[1:].astype(np.int64)
    m = np.zeros(n, dtype=np.int64)
    e_docs, e_pos = [], []
    active = (ia < ea) & (ib < eb)
    while active.any():
        idx = np.nonzero(active)[0]
        va = pa_flat[ia[idx]]
        vb = pb_flat[ib[idx]]
        le = vb <= va
        ib[idx[le]] += 1  # advance right past/onto left
        rest = idx[~le]
        if len(rest):
            # rest pointers are untouched this step: reuse the gathered vals
            gap_ok = (
                vb[~le].astype(np.int64) - va[~le].astype(np.int64)
            ) <= dist
            mdoc = rest[gap_ok]
            if len(mdoc):
                e_docs.append(mdoc)
                e_pos.append(pb_flat[ib[mdoc]])
                m[mdoc] += 1
                ia[mdoc] += 1
                ib[mdoc] += 1
            ia[rest[~gap_ok]] += 1  # gap too large: advance left
        active = (ia < ea) & (ib < eb)
    if e_docs:
        docs_emit = np.concatenate(e_docs)
        pos_emit = np.concatenate(e_pos)
        order = np.argsort(docs_emit, kind="stable")  # step order kept
        return m, docs_emit[order], pos_emit[order]
    return m, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)


def window2_batch(
    pa_flat, pa_off, pb_flat, pb_off, dist: int
):
    """Vectorized 2-arg #WINDOW (QryIopWindow.java:55-178 semantics: match
    when max-min < dist strictly, emit max, advance all on match else
    advance every iterator at the min).  Same contract as
    :func:`near2_batch`."""
    import numpy as np

    n = len(pa_off) - 1
    ia = pa_off[:-1].astype(np.int64).copy()
    ib = pb_off[:-1].astype(np.int64).copy()
    ea = pa_off[1:].astype(np.int64)
    eb = pb_off[1:].astype(np.int64)
    m = np.zeros(n, dtype=np.int64)
    e_docs, e_pos = [], []
    active = (ia < ea) & (ib < eb)
    while active.any():
        idx = np.nonzero(active)[0]
        va = pa_flat[ia[idx]].astype(np.int64)
        vb = pb_flat[ib[idx]].astype(np.int64)
        hi = np.maximum(va, vb)
        lo = np.minimum(va, vb)
        mt = (hi - lo) < dist
        mdoc = idx[mt]
        if len(mdoc):
            e_docs.append(mdoc)
            e_pos.append(hi[mt].astype(np.int32))
            m[mdoc] += 1
            ia[mdoc] += 1
            ib[mdoc] += 1
        rest = idx[~mt]
        if len(rest):
            va_r, vb_r = va[~mt], vb[~mt]
            ia[rest[va_r <= vb_r]] += 1  # advance every iterator at the min
            ib[rest[vb_r <= va_r]] += 1
        active = (ia < ea) & (ib < eb)
    if e_docs:
        docs_emit = np.concatenate(e_docs)
        pos_emit = np.concatenate(e_pos)
        order = np.argsort(docs_emit, kind="stable")
        return m, docs_emit[order], pos_emit[order]
    return m, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)


def windowN_batch(flats, offs, dist: int):
    """Vectorized n-arg #WINDOW over many docs: no cascade needed — each
    step computes the k current values per active doc, matches when
    max-min < dist (emit max, advance all), else advances every pointer
    sitting at the min (QryIopWindow.java:55-178).  Same output contract
    as :func:`near2_batch`."""
    import numpy as np

    k = len(flats)
    n = len(offs[0]) - 1
    ptr = np.stack([o[:-1].astype(np.int64) for o in offs])  # (k, n)
    end = np.stack([o[1:].astype(np.int64) for o in offs])
    m = np.zeros(n, dtype=np.int64)
    e_docs, e_pos = [], []
    active = (ptr < end).all(axis=0)
    while active.any():
        idx = np.nonzero(active)[0]
        vals = np.stack(
            [flats[i][ptr[i, idx]].astype(np.int64) for i in range(k)]
        )  # (k, nactive)
        hi = vals.max(axis=0)
        lo = vals.min(axis=0)
        mt = (hi - lo) < dist
        mdoc = idx[mt]
        if len(mdoc):
            e_docs.append(mdoc)
            e_pos.append(hi[mt].astype(np.int32))
            m[mdoc] += 1
            ptr[:, mdoc] += 1
        rest = idx[~mt]
        if len(rest):
            at_min = vals[:, ~mt] == lo[~mt][None, :]  # (k, nrest)
            for i in range(k):
                ptr[i, rest[at_min[i]]] += 1
        active = (ptr < end).all(axis=0)
    if e_docs:
        docs_emit = np.concatenate(e_docs)
        pos_emit = np.concatenate(e_pos)
        order = np.argsort(docs_emit, kind="stable")
        return m, docs_emit[order], pos_emit[order]
    return m, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)


def nearN_batch(flats, offs, dist: int):
    """Vectorized n-arg #NEAR: the reference's per-outer-iteration cascade
    (align each list past the previous list's position, then check
    adjacent gaps, advance-all on match else advance list 0 —
    QryIopNear.java:117-179) as a per-doc STAGE automaton: stage j aligns
    list j, stages then run the adjacent-gap checks; each step advances
    one pointer or one stage per active doc.  Byte-identical to
    :func:`near_positions` (fuzz-pinned)."""
    import numpy as np

    k = len(flats)
    n = len(offs[0]) - 1
    ptr = np.stack([o[:-1].astype(np.int64) for o in offs])
    end = np.stack([o[1:].astype(np.int64) for o in offs])
    m = np.zeros(n, dtype=np.int64)
    # stage 1..k-1: aligning that list; stage k: gap checks done -> match
    stage = np.ones(n, dtype=np.int64)
    left = np.full(n, -1, dtype=np.int64)  # aligned pos of list stage-1
    e_docs, e_pos = [], []
    alive = np.ones(n, dtype=bool)
    for i in range(k):
        alive &= offs[i][1:] > offs[i][:-1]
    # initialize left from list 0
    sel = np.nonzero(alive)[0]
    if len(sel):
        left[sel] = flats[0][ptr[0, sel]]
    while alive.any():
        for j in range(1, k):
            js = np.nonzero(alive & (stage == j))[0]
            if not len(js):
                continue
            # list-j cursor exhausted -> doc done (cannot align)
            done = js[ptr[j, js] >= end[j, js]]
            if len(done):
                alive[done] = False
                js = np.setdiff1d(js, done, assume_unique=True)
            if not len(js):
                continue
            vj = flats[j][ptr[j, js]].astype(np.int64)
            behind = vj <= left[js]
            ptr[j, js[behind]] += 1  # advance past the previous list
            fwd = js[~behind]
            if len(fwd):
                left[fwd] = flats[j][ptr[j, fwd]]
                stage[fwd] += 1
        # stage k: all aligned — run the adjacent gap checks
        ks = np.nonzero(alive & (stage == k))[0]
        if len(ks):
            ok = np.ones(len(ks), dtype=bool)
            prev = flats[0][ptr[0, ks]].astype(np.int64)
            for j in range(1, k):
                cur = flats[j][ptr[j, ks]].astype(np.int64)
                ok &= (cur - prev) <= dist
                prev = cur
            mdoc = ks[ok]
            if len(mdoc):
                e_docs.append(mdoc)
                e_pos.append(
                    flats[k - 1][ptr[k - 1, mdoc]].astype(np.int32)
                )
                m[mdoc] += 1
                ptr[:, mdoc] += 1  # match: advance ALL
            fdoc = ks[~ok]
            if len(fdoc):
                ptr[0, fdoc] += 1  # mismatch: advance list 0 only
            # restart cascade for both outcomes
            restart = ks
            stage[restart] = 1
            ex = restart[ptr[0, restart] >= end[0, restart]]
            if len(ex):
                alive[ex] = False
            live = np.setdiff1d(restart, ex, assume_unique=True)
            if len(live):
                left[live] = flats[0][ptr[0, live]]
    if e_docs:
        docs_emit = np.concatenate(e_docs)
        pos_emit = np.concatenate(e_pos)
        order = np.argsort(docs_emit, kind="stable")
        return m, docs_emit[order], pos_emit[order]
    return m, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)


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
