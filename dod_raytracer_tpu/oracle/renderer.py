"""Scalar numpy oracle renderer.

An independent, deliberately-naive per-pixel implementation of the exact
reference semantics (``src/main.cpp:156-347`` plus the per-family validity
rules) used as the golden-image and per-kernel oracle for the JAX/Pallas
paths — the institutionalized version of the reference's dual-path
scalar-vs-AVX pattern (SURVEY.md §4).  No JAX imports here; float32
throughout to track the reference's precision.
"""

from __future__ import annotations

import numpy as np

F = np.float32
INF = F(np.inf)


def _dot(a, b):
    return F(a[0] * b[0] + a[1] * b[1] + a[2] * b[2])


def _normalize(v):
    return v / F(np.sqrt(_dot(v, v)))


def _reflect(i, n):
    return i - F(2.0) * _dot(n, i) * n


class OracleScene:
    """Plain-python scene mirror (host lists, no padding)."""

    def __init__(self):
        self.spheres = []  # (center, radius, color)
        self.planes = []  # (point, normal, color)
        self.cylinders = []  # (base, unit axis, radius, height, color)
        self.triangles = []  # (A, B, C, AN, BN, CN, color)
        self.lights = []  # (position, intensity)

    @classmethod
    def from_builder(cls, b):
        """Build from a SceneBuilder's host-side lists."""
        s = cls()
        for c, r, col in b._spheres:
            s.spheres.append((np.array(c, F), F(r), np.array(col, F)))
        for p, n, col in b._planes:
            s.planes.append((np.array(p, F), np.array(n, F), np.array(col, F)))
        for base, axis, r, h, col in b._cylinders:
            s.cylinders.append((np.array(base, F), np.array(axis, F), F(r), F(h), np.array(col, F)))
        for verts, normals, mesh_idx in zip(b._tri_verts, b._tri_normals, b._tri_mesh):
            col = np.array(b._mesh_colors[mesh_idx[0]], F)
            for k in range(verts.shape[0]):
                v, n = verts[k], normals[k]
                s.triangles.append((v[0], v[1], v[2], n[0], n[1], n[2], col))
        for p, i in b._lights:
            s.lights.append((np.array(p, F), F(i)))
        return s


def intersect_sphere_family(scene, o, d, clip):
    """Vectorized-path sphere rules (sphere.cpp:62-142)."""
    best_t, best = INF, None
    for center, radius, color in scene.spheres:
        L = center - o
        dist_sq = _dot(L, L)
        r_sq = radius * radius
        if not dist_sq > r_sq:
            continue
        tca = _dot(L, d)
        d2 = dist_sq - tca * tca
        if not d2 < r_sq:
            continue
        thc = F(np.sqrt(r_sq - d2))
        t0, t1 = tca - thc, tca + thc
        if t0 < 0 or t1 < 0:
            continue
        t = min(t0, t1)
        if t < best_t:
            best_t, best = t, (center, color)
    if best is None or best_t >= clip:
        return None
    center, color = best
    point = o + d * best_t
    return best_t, point, _normalize(point - center), color


def intersect_plane_family(scene, o, d, clip, eps):
    """Vectorized-path plane rules (plane.cpp:67-112)."""
    best_t, best = INF, None
    for point, normal, color in scene.planes:
        denom = _dot(d, normal)
        if not abs(denom) > eps:
            continue
        t = _dot(point - o, normal) / denom
        if not t > eps:
            continue
        if t < best_t:
            best_t, best = t, (normal, color)
    if best is None or best_t >= clip:
        return None
    normal, color = best
    return best_t, o + d * best_t, normal, color


def intersect_cylinder_family(scene, o, d, clip, eps, color_bug=False):
    """Scalar cylinder rules (cylinder.cpp:76-208)."""
    best_t, best = clip, None
    for base, axis, radius, height, color in scene.cylinders:
        r_sq = radius * radius
        # body (cylinder.cpp:76-118)
        delta_p = o - base
        v_rem = d - _dot(d, axis) * axis
        dp_rem = delta_p - _dot(delta_p, axis) * axis
        a = _dot(v_rem, v_rem)
        bq = F(2.0) * _dot(v_rem, dp_rem)
        c = _dot(dp_rem, dp_rem) - r_sq
        disc = bq * bq - F(4.0) * a * c
        if disc >= eps:
            sq = F(np.sqrt(disc))
            t_sub = (-bq - sq) / (F(2.0) * a)
            t_add = (-bq + sq) / (F(2.0) * a)
            if t_sub < 0 and t_add < 0:
                t = INF
            elif t_sub < 0:
                t = t_add
            elif t_add < 0:
                t = t_sub
            else:
                t = min(t_sub, t_add)
            if np.isfinite(t):
                hp = o + d * t
                ax_fac = _dot(hp - base, axis)
                if 0.0 <= ax_fac <= height and t < best_t:
                    n = _normalize(hp - base - axis * ax_fac)
                    best_t, best = t, (hp, n, color)
        # caps (cylinder.cpp:120-152) at offsets 0 and height
        for off in (F(0.0), height):
            center = base + axis * off
            denom = _dot(d, axis)
            if abs(denom) < eps:
                continue
            t = _dot(center - o, axis) / denom
            if t < eps or t > clip:
                continue
            hp = o + d * t
            on_plane = hp - center
            if _dot(on_plane, on_plane) > r_sq:
                continue
            if t < best_t:
                n = -axis if _dot(d, axis) > 0 else axis
                best_t, best = t, (hp, n, color)
    if best is None:
        return None
    hp, n, color = best
    if color_bug:
        color = np.zeros(3, F)  # reference drops the color (cylinder.cpp:204)
    return best_t, hp, n, color


def intersect_triangle_family(scene, o, d, clip):
    """Vectorized-path Möller–Trumbore rules (triangle.cpp:43-139)."""
    best_t, best = clip, None
    for A, B, C, AN, BN, CN, color in scene.triangles:
        ab = B - A
        ac = C - A
        pvec = np.cross(d, ac).astype(F)
        det = _dot(pvec, ab)
        if not abs(det) > 0.0:
            continue
        inv_det = F(1.0) / det
        tvec = o - A
        u = _dot(tvec, pvec) * inv_det
        if not (0.0 < u < 1.0):
            continue
        qvec = np.cross(tvec, ab).astype(F)
        v = _dot(d, qvec) * inv_det
        if not (v > 0.0 and u + v < 1.0):
            continue
        t = _dot(ac, qvec) * inv_det
        if not (0.0 < t < best_t):
            continue
        w0 = F(1.0) - (u + v)
        normal = w0 * AN + u * BN + v * CN  # NOT renormalized (triangle.cpp:172)
        best_t, best = t, (o + d * t, normal, color)
    if best is None:
        return None
    hp, n, color = best
    return best_t, hp, n, color


def closest_hit(scene, o, d, eps, color_bug=False):
    """Family chain with strict-improvement fusion (main.cpp:314-321)."""
    clip = INF
    hit = None
    for fam in (
        lambda: intersect_sphere_family(scene, o, d, clip),
        lambda: intersect_plane_family(scene, o, d, clip, eps),
        lambda: intersect_cylinder_family(scene, o, d, clip, eps, color_bug),
        lambda: intersect_triangle_family(scene, o, d, clip),
    ):
        res = fam()
        if res is not None and res[0] < clip:
            hit = res
            clip = res[0]
    return hit


def occluded_any(scene, o, d, t_max, eps):
    for fam, args in (
        (intersect_sphere_family, (scene, o, d, t_max)),
        (intersect_plane_family, (scene, o, d, t_max, eps)),
        (intersect_cylinder_family, (scene, o, d, t_max, eps)),
        (intersect_triangle_family, (scene, o, d, t_max)),
    ):
        if fam(*args) is not None:
            return True
    return False


def lighting_factor(scene, point, normal, pixel_dir, eps):
    """getLightingFactor (main.cpp:221-244)."""
    factor = F(0.2)
    for lp, intensity in scene.lights:
        to_light = lp - point
        dist = F(np.sqrt(_dot(to_light, to_light)))
        ldir = to_light / dist
        if occluded_any(scene, point + ldir * F(0.01), ldir, dist, eps):
            continue
        dist_factor = intensity / _dot(to_light, to_light)
        diffuse = max(F(0.0), _dot(normal, ldir))
        refl = _reflect(ldir, normal)
        spec = max(F(0.0), _dot(refl, pixel_dir)) ** F(7.0)
        factor += (diffuse + spec) * dist_factor
    return factor


def render(scene, width, height, eps=F(1.0e-4), depth=10, color_bug=False):
    """Full-frame render -> float32 (H, W, 3) linear colors."""
    eps = F(eps)
    ratio = F(width) / F(height)
    wstep = F(2.0) * ratio / F(width)
    hstep = F(2.0) / F(height)
    origin0 = np.array([0.0, 0.0, -4.9], F)
    img = np.zeros((height, width, 3), F)
    for i in range(height):
        for j in range(width):
            pixel_dir = np.array([-ratio + F(j) * wstep, F(1.0) - F(i) * hstep, 1.0], F)
            d = _normalize(pixel_dir)
            o = origin0.copy()
            final = np.zeros(3, F)
            for k in range(depth):
                hit = closest_hit(scene, o, d, eps, color_bug)
                if hit is None:
                    break
                t, point, normal, color = hit
                w = F(1.0) / F(2.0**k)
                factor = lighting_factor(scene, point, normal, pixel_dir, eps)
                final = (F(1.0) - w) * final + w * (color * factor)
                d = _reflect(d, normal)
                o = point + d * eps
            img[i, j] = final
    return img


def quantize_u8(img):
    return np.clip(img * F(255.0), 0.0, 255.0).astype(np.uint8)
