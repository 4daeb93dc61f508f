"""Vectorized geometry predicates/measures — the engine's "exact refine" layer.

The coarse stage of every spatial join is a cell equi-join that Catalyst
executes natively; these numpy kernels run *after* it, inside Arrow-batched
pandas UDFs, to compute the exact predicate (the role the reference delegates
to Meshes.jl geometry code after its R-tree lookup, gpkg.jl:411-448).

Point-in-polygon is boundary-inclusive even-odd ray casting. With vertices
on the engine's centidegree integer lattice all products stay < 2**31 so the
float64 arithmetic is exact — the kernel then agrees bit-for-bit with the
integer sign tests used in oracle SQL (dialect.point_in_triangle_sql).
"""

from __future__ import annotations

import numpy as np

from geoio_jl_spark.functions import wkb as W


def _ring_contains(px: np.ndarray, py: np.ndarray, ring: np.ndarray):
    """Even-odd crossings + boundary flags for many points vs one ring.

    Returns (inside, on_boundary) boolean arrays. Half-open rule
    [ymin, ymax) for crossings; boundary = point on any edge segment.
    """
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px_ = px[:, None]
    py_ = py[:, None]
    # boundary: cross == 0 and within segment bbox
    cross = (x2 - x1) * (py_ - y1) - (y2 - y1) * (px_ - x1)
    on_seg = (
        (cross == 0)
        & (px_ >= np.minimum(x1, x2)) & (px_ <= np.maximum(x1, x2))
        & (py_ >= np.minimum(y1, y2)) & (py_ <= np.maximum(y1, y2))
    )
    on_boundary = on_seg.any(axis=1)
    # crossings: edge straddles the horizontal ray (half-open in y)
    straddle = (y1 <= py_) != (y2 <= py_)
    # x of intersection > px  (safe: y2 != y1 where straddle)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py_ - y1) * (x2 - x1) / np.where(y2 == y1, 1.0, y2 - y1)
    crossings = (straddle & (xint > px_)).sum(axis=1)
    return (crossings % 2 == 1), on_boundary


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def points_in_geom(px: np.ndarray, py: np.ndarray, g: W.Geom) -> np.ndarray:
    """Boundary-inclusive containment of many points in one polygon /
    multipolygon geometry."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if g.kind == W.POLYGON:
        return _poly_contains(px, py, g, 0, len(g.rings) - 1)
    if g.kind == W.MULTIPOLYGON:
        out = np.zeros(len(px), dtype=bool)
        parts = g.parts if g.parts else [0, len(g.rings) - 1]
        for pi in range(len(parts) - 1):
            out |= _poly_contains(px, py, g, parts[pi], parts[pi + 1])
        return out
    if g.kind == W.GEOMETRYCOLLECTION:
        out = np.zeros(len(px), dtype=bool)
        for c in g.geoms:
            if c.kind in (W.POLYGON, W.MULTIPOLYGON):
                out |= points_in_geom(px, py, c)
        return out
    raise ValueError(f"containment undefined for kind {g.kind}")


def _poly_contains(px, py, g: W.Geom, r0: int, r1: int) -> np.ndarray:
    exterior = _close_ring(g.coords[g.rings[r0]:g.rings[r0 + 1], :2])
    inside, on_b = _ring_contains(px, py, exterior)
    result = inside | on_b
    for ri in range(r0 + 1, r1):  # holes: inside hole (not on its edge) → out
        hole = _close_ring(g.coords[g.rings[ri]:g.rings[ri + 1], :2])
        h_in, h_on = _ring_contains(px, py, hole)
        result &= ~(h_in & ~h_on)
    return result


def points_in_wkb_batch(px, py, wkb_bytes: bytes) -> np.ndarray:
    """Decode one polygon WKB and test a batch of points against it."""
    return points_in_geom(np.asarray(px), np.asarray(py),
                          W.decode_wkb(bytes(wkb_bytes)))


def triangle_normal(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Unit facet normal (STL writer semantics, stl.jl:106,137)."""
    n = np.cross(b - a, c - a)
    norm = np.linalg.norm(n)
    return n / norm if norm else n


def affine_from_grid(v11: np.ndarray, v21: np.ndarray, v12: np.ndarray):
    """Recover (A, b) of the grid affine from 3 vertices — the closed form
    of geotiff.jl:152-199: b = v(1,1); A columns = v(2,1)-b, v(1,2)-b."""
    b = np.asarray(v11, dtype=np.float64)
    a1 = np.asarray(v21, dtype=np.float64) - b
    a2 = np.asarray(v12, dtype=np.float64) - b
    return np.column_stack([a1, a2]), b


def clip_ring_rect(ring: np.ndarray, minx: float, miny: float,
                   maxx: float, maxy: float) -> np.ndarray:
    """Sutherland-Hodgman clip of one polygon ring against an axis-
    aligned rectangle — four half-plane passes, vectorizable per edge
    but written as the textbook vertex walk (rings are short; the
    DataFrame layer batches across rings, not within one).

    Input/output rings are open (first vertex NOT repeated); an empty
    (0, 2) array means the ring lies fully outside.  Convex clip window
    guarantees a single output ring."""
    out = np.asarray(ring, np.float64)
    if len(out) and (out[0] == out[-1]).all():
        out = out[:-1]
    for axis, bound, keep_ge in ((0, minx, True), (0, maxx, False),
                                 (1, miny, True), (1, maxy, False)):
        if len(out) == 0:
            break
        pts = out
        nxt = np.roll(pts, -1, axis=0)
        def inside(p):
            return p[axis] >= bound if keep_ge else p[axis] <= bound
        res = []
        for p, q in zip(pts, nxt):
            pin, qin = inside(p), inside(q)
            if pin:
                res.append(p)
            if pin != qin:                    # edge crosses the boundary
                t = (bound - p[axis]) / (q[axis] - p[axis])
                res.append(p + t * (q - p))
        out = np.array(res, np.float64).reshape(-1, 2)
    return out


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of an open ring (positive = CCW)."""
    r = np.asarray(ring, np.float64)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def clip_line_rect(line: np.ndarray, minx: float, miny: float,
                   maxx: float, maxy: float) -> list[np.ndarray]:
    """Clip a polyline against an axis-aligned rectangle — Liang-Barsky
    per segment, with consecutive surviving pieces stitched back into
    continuous parts.  Returns a list of (m, 2) arrays (m >= 2); a line
    may leave and re-enter the rectangle, so several parts can come
    back (the MVT multi-linestring case)."""
    pts = np.asarray(line, np.float64)
    parts: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for k in range(len(pts) - 1):
        p, q = pts[k], pts[k + 1]
        d = q - p
        t0, t1 = 0.0, 1.0
        ok = True
        for dim, lo, hi in ((0, minx, maxx), (1, miny, maxy)):
            if d[dim] == 0.0:
                if p[dim] < lo or p[dim] > hi:
                    ok = False
                    break
                continue
            ta = (lo - p[dim]) / d[dim]
            tb = (hi - p[dim]) / d[dim]
            if ta > tb:
                ta, tb = tb, ta
            t0, t1 = max(t0, ta), min(t1, tb)
            if t0 > t1:
                ok = False
                break
        if not ok:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        a, b = p + t0 * d, p + t1 * d
        if cur and np.allclose(cur[-1], a, atol=1e-9):
            cur.append(b)                     # continues the open part
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        parts.append(cur)
    return [np.array(part) for part in parts]


def simplify_dp(line: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative stack — no
    recursion-depth limit on pathological inputs).  Keeps endpoints;
    every dropped vertex lies within ``tol`` perpendicular distance of
    the simplified chain.  The standard reduction before encoding
    lower-zoom tiles."""
    pts = np.asarray(line, np.float64)
    n = len(pts)
    if n <= 2 or tol <= 0:
        return pts.copy()
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[b] - pts[a]
        norm = np.hypot(*seg)
        mid = pts[a + 1: b]
        if norm == 0.0:                        # degenerate: distance to point
            d = np.hypot(*(mid - pts[a]).T)
        else:
            d = np.abs(np.cross(seg, mid - pts[a])) / norm
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[a + 1 + k] = True
            stack.append((a, a + 1 + k))
            stack.append((a + 1 + k, b))
    return pts[keep]
