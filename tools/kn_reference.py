#!/usr/bin/env python3
"""Independent reference for interpolated modified Kneser-Ney (the
knLmFitByClass/knLmApplyJoined contract) — used to hand-compute the
Round18Spec fixtures. Pure python, no Spark/DuckDB: a THIRD formulation
of the same math.

Conventions (must match the Scala engine):
 - whitespace tokens, capped at capTokens; grams slide (no BOS/EOS)
 - adjusted counts: raw at order n; continuation (#distinct left
   extensions) below
 - discounts per order from count-of-counts n1..n4 of adjusted counts:
   Y = n1/(n1+2n2) (0.5 if denom 0); D1 = 1-2Y n2/n1 (0.5 if n1=0);
   D2 = 2-3Y n3/n2 (1.0 if n2=0); D3 = 3-4Y n4/n3 (1.5 if n3=0);
   clamped to [0, j]
 - p1 = max(a1-D,0)/S1 + ((d1*u1+d2*u2+d3*u3p)/S1)/V
 - pk = max(ak-D,0)/S(h) + ((d1*h1+d2*h2+d3*h3p)/S(h)) * p_{k-1},
   or p_{k-1} when history h unseen
 - floor max(p, 1e-10); nll = -sum(m ln p)/sum(m) rounded to 4
 - minCount prunes NUMERATOR lookups only (stats stay full)
"""
import math
import sys
from collections import Counter


def toks(text, cap=512):
    return text.split()[:cap]


def fit(docs, order, min_count=1):
    """docs: list of token lists (one class). Returns model dict."""
    raw = {}  # k -> Counter of gram tuples
    for k in range(1, order + 1):
        c = Counter()
        for t in docs:
            for i in range(len(t) - k + 1):
                c[tuple(t[i:i + k])] += 1
        raw[k] = c
    adj = {}
    for k in range(1, order + 1):
        if k == order:
            adj[k] = dict(raw[k])
        else:
            a = Counter()
            for g in raw[k + 1]:  # each (k+1)-TYPE: distinct predecessor
                a[g[1:]] += 1
            adj[k] = dict(a)
    disc = {}
    for k in range(1, order + 1):
        n = Counter()
        for v in adj[k].values():
            if 1 <= v <= 4:
                n[v] += 1
        n1, n2, n3, n4 = n[1], n[2], n[3], n[4]
        y = n1 / (n1 + 2 * n2) if (n1 + 2 * n2) > 0 else 0.5
        d1 = 1.0 - 2.0 * y * n2 / n1 if n1 > 0 else 0.5
        d2 = 2.0 - 3.0 * y * n3 / n2 if n2 > 0 else 1.0
        d3 = 3.0 - 4.0 * y * n4 / n3 if n3 > 0 else 1.5
        clamp = lambda x, hi: max(0.0, min(hi, x))
        disc[k] = (clamp(d1, 1.0), clamp(d2, 2.0), clamp(d3, 3.0))
    pstats = {}
    for k in range(2, order + 1):
        st = {}
        for g, a in adj[k].items():
            h = g[:-1]
            s = st.setdefault(h, [0, 0, 0, 0])
            s[0] += a
            if a == 1:
                s[1] += 1
            elif a == 2:
                s[2] += 1
            else:
                s[3] += 1
        pstats[k] = st
    s1 = sum(adj[1].values())
    u1 = sum(1 for v in adj[1].values() if v == 1)
    u2 = sum(1 for v in adj[1].values() if v == 2)
    u3p = sum(1 for v in adj[1].values() if v >= 3)
    v = len(adj[1])
    grams = {k: {g: a for g, a in adj[k].items() if a >= min_count}
             for k in range(1, order + 1)}
    return dict(order=order, grams=grams, pstats=pstats, disc=disc,
                cs=(s1, u1, u2, u3p, v))


def dsel(a, d):
    if a >= 3:
        return d[2]
    if a == 2:
        return d[1]
    if a == 1:
        return d[0]
    return 0.0


def prob(model, ng):
    """ng: tuple of order tokens."""
    n = model['order']
    s1, u1, u2, u3p, v = model['cs']
    d = model['disc'][1]
    a1 = model['grams'][1].get(ng[-1:], 0)
    p = max(a1 - dsel(a1, d), 0.0) / s1 + \
        ((d[0] * u1 + d[1] * u2 + d[2] * u3p) / s1) / v
    for k in range(2, n + 1):
        h = ng[n - k:n - 1]
        st = model['pstats'][k].get(h)
        if st is None:
            continue
        s, h1, h2, h3p = st
        dk = model['disc'][k]
        ak = model['grams'][k].get(ng[n - k:], 0)
        p = max(ak - dsel(ak, dk), 0.0) / s + \
            ((dk[0] * h1 + dk[1] * h2 + dk[2] * h3p) / s) * p
    return max(p, 1e-10)


def score(model, t):
    n = model['order']
    if len(t) < n:
        return None
    occ = Counter(tuple(t[i:i + n]) for i in range(len(t) - n + 1))
    lp = sum(m * math.log(prob(model, g)) for g, m in occ.items())
    m = sum(occ.values())
    return round(-lp / m, 4)


if __name__ == '__main__':
    # the Round18Spec fixture: one class, order 2 then order 3
    docs = [toks("a b a b c"), toks("a b c d"), toks("b c a")]
    for order in (2, 3):
        for mc in (1, 2):
            m = fit(docs, order, mc)
            print(f"order={order} minCount={mc} disc={ {k: tuple(round(x,6) for x in v) for k,v in m['disc'].items()} }")
            print(f"  cs={m['cs']}")
            if order == 2:
                print(f"  adj1={ {''.join(k): v for k, v in sorted(m['grams'][1].items())} }")
            for d in ["a b a b c", "a b c d", "b c a", "c d a b", "z z z"]:
                print(f"  nll({d!r}) = {score(m, toks(d))}")
