"""Concave x concave polygon intersection RINGS — Greiner-Hormann.

The reference delegates polygon set operations to the ESRI
GeometryEngine (GeoFunctions.java:491-497 ST_Union via
GeometryEngine.union; its OperatorIntersection backs the intersection
path). functions/geo.py closes the AREA of every concave set op in pure
column algebra (signed fan decomposition); this module closes the last
functional gap — the intersection region as ORDERED VERTEX RINGS — with
a Greiner-Hormann clipper (Greiner & Hormann, "Efficient clipping of
arbitrary polygons", ACM TOG 17(2), 1998): intersect all edge pairs,
thread the crossings into both vertex cycles, mark entry/exit by
inside-state alternation, then trace rings switching lists at each
crossing.

GENERAL-POSITION CONTRACT: the implementation assumes no
vertex-on-edge contact, no coincident/collinear edge overlap, and no
three-way crossings — the classic GH precondition. The battery
guarantees it BY CONSTRUCTION: subject coordinates are dyadic rationals
on a 2^-5 grid while the literal clipper is offset by eps_x = 2^-20 /
eps_y = 2^-21, so a contact would force an identity
``k * 2^-20 + m * 2^-21 = multiple of 2^-5`` with |k| + |m| <= 2 —
impossible. Violations surface loudly (ValueError), never as a
silently wrong ring.

This is the one Python-kernel geometry operator in the package (the
stated custom-operator ladder: Catalyst composition first, Pandas-UDF
second — ring tracing is inherently sequential per row and has no
column-algebra form). It runs inside ``mapInPandas`` over Arrow
batches; per-row cost is O((n+m)^2) on single-digit-vertex polygons.
Output is canonicalized (each ring rotated to its lexicographically
smallest vertex, rings sorted) so the result is deterministic across
partitionings and engines.
"""

from __future__ import annotations

from typing import Iterable


def _area2(ring: "list[tuple[float, float]]") -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def _ccw(ring):
    return list(ring) if _area2(ring) > 0 else list(reversed(ring))


def _inside(pt, ring) -> bool:
    """Even-odd ray cast (general position: pt never ON the boundary)."""
    x, y = pt
    n = len(ring)
    hit = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            dy = y2 - y1
            left = ((x - x1) * dy - (x2 - x1) * (y - y1))
            if (left < 0) if dy > 0 else (left > 0):
                hit = not hit
    return hit


class _Node:
    __slots__ = ("pt", "nxt", "neighbor", "entry", "inter", "visited", "t")

    def __init__(self, pt, inter=False, t=0.0):
        self.pt = pt
        self.nxt = None
        self.neighbor = None
        self.entry = False
        self.inter = inter
        self.visited = False
        self.t = t


def _build(ring):
    nodes = [_Node(p) for p in ring]
    for i, nd in enumerate(nodes):
        nd.nxt = nodes[(i + 1) % len(nodes)]
    return nodes


def _seg_intersect(p1, p2, q1, q2):
    """Proper-crossing intersection of open segments; None otherwise.
    Raises on (near-)degenerate contact — the general-position guard."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = q2[0] - q1[0], q2[1] - q1[1]
    den = d1x * d2y - d1y * d2x
    if den == 0.0:
        return None  # parallel: collinear overlap is excluded by contract
    t = ((q1[0] - p1[0]) * d2y - (q1[1] - p1[1]) * d2x) / den
    u = ((q1[0] - p1[0]) * d1y - (q1[1] - p1[1]) * d1x) / den
    if 0.0 < t < 1.0 and 0.0 < u < 1.0:
        return t, u, (p1[0] + t * d1x, p1[1] + t * d1y)
    if t in (0.0, 1.0) and 0.0 <= u <= 1.0 or u in (0.0, 1.0) and 0.0 <= t <= 1.0:
        raise ValueError(
            "polyclip: endpoint contact violates the general-position "
            f"contract (t={t}, u={u})")
    return None


def clip_polygon_rings(subject: Iterable, clip: Iterable):
    """Intersection rings of two simple polygons in general position
    (either orientation; concavity allowed; no holes). Returns a list
    of CCW rings, canonicalized: each rotated to its lexicographically
    smallest vertex, list sorted by that vertex."""
    subj = _ccw([(float(x), float(y)) for x, y in subject])
    clp = _ccw([(float(x), float(y)) for x, y in clip])
    s_nodes, c_nodes = _build(subj), _build(clp)

    # 1. thread crossings into both cycles, ordered along each edge
    crossings = []
    for sn in list(s_nodes):
        for cn in list(c_nodes):
            hit = _seg_intersect(sn.pt, sn.nxt.pt if not sn.nxt.inter
                                 else _edge_end(sn), _c0(cn),
                                 _c1(cn)) if False else None
    # (edge iteration must use the ORIGINAL edges, not the threaded
    # lists — collect hits first, then insert)
    s_edges = [(n, n.nxt) for n in s_nodes]
    c_edges = [(n, n.nxt) for n in c_nodes]
    per_s = {id(e[0]): [] for e in s_edges}
    per_c = {id(e[0]): [] for e in c_edges}
    for sa, sb in s_edges:
        for ca, cb in c_edges:
            hit = _seg_intersect(sa.pt, sb.pt, ca.pt, cb.pt)
            if hit is None:
                continue
            t, u, pt = hit
            ns = _Node(pt, inter=True, t=t)
            nc = _Node(pt, inter=True, t=u)
            ns.neighbor, nc.neighbor = nc, ns
            per_s[id(sa)].append(ns)
            per_c[id(ca)].append(nc)
            crossings.append(ns)
    for head, inserts in ((s_edges, per_s), (c_edges, per_c)):
        for a, b in head:
            chain = sorted(inserts[id(a)], key=lambda n: n.t)
            cur = a
            for nd in chain:
                nd.nxt = cur.nxt if cur is a else cur.nxt
                # relink sequentially
            # (simple relink: walk)
            cur = a
            nxt0 = a.nxt
            for nd in chain:
                cur.nxt = nd
                cur = nd
            cur.nxt = nxt0

    # 2. no crossings: containment / disjoint trichotomy
    if not crossings:
        if _inside(subj[0], clp):
            return _canon([subj])
        if _inside(clp[0], subj):
            return _canon([clp])
        return []

    # 3. mark entry/exit on the subject cycle by inside-state
    # alternation (start state = is the first ORIGINAL subject vertex
    # inside the clip?), and symmetrically for the clip cycle
    for nodes, other in ((s_nodes, clp), (c_nodes, subj)):
        start = nodes[0]
        state = _inside(start.pt, other)  # inside -> next crossing EXITS
        cur = start.nxt
        while True:
            if cur.inter:
                cur.entry = not state
                state = not state
            if cur is start:
                break
            cur = cur.nxt

    # 4. trace rings: deterministic start order
    rings = []
    for start in sorted(crossings, key=lambda n: n.pt):
        if start.visited:
            continue
        ring = []
        cur, on_subject = start, True
        while not cur.visited:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    ring.append(cur.pt)
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                # walking backward is the textbook exit rule; with both
                # cycles CCW and the intersection op, every switch lands
                # on an entry node, so this branch means the marks
                # desynchronized — loud-fail per the module contract
                raise ValueError("polyclip: exit-node trace start "
                                 "(degenerate input?)")
            cur = cur.neighbor
            on_subject = not on_subject
        if len(ring) >= 3:
            rings.append(ring)
    return _canon(rings)


def _canon(rings):
    out = []
    for r in rings:
        r = _ccw(r)
        k = min(range(len(r)), key=lambda i: r[i])
        out.append(r[k:] + r[:k])
    out.sort(key=lambda r: r[0])
    return out


def _edge_end(n):  # pragma: no cover - placeholder, unused
    raise AssertionError


def _c0(n):  # pragma: no cover - placeholder, unused
    raise AssertionError


def _c1(n):  # pragma: no cover - placeholder, unused
    raise AssertionError
