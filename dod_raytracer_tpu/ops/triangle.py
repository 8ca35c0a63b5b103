"""Batched Möller–Trumbore ray-triangle intersection.

Replicates the reference's 8-wide AVX kernel (``triangle.cpp:22-140``); the
validity ladder matches the vectorized path bit-for-bit:

  det  = (d x AC) . AB ;  valid = |det| > 0       (strict, NO eps — :73)
  u    = (tvec . pvec)/det ; valid &= 0 < u < 1    (strict — :85-87)
  v    = (d . qvec)/det    ; valid &= v > 0, u+v<1 (strict — :98-100)
  t    = (AC . qvec)/det   ; valid &= 0 < t < clip (strict — :109-111)

Hit attributes (triangle.cpp:169-174): smooth normal is the barycentric
blend  (1-u-v)*AN + u*BN + v*CN  — deliberately NOT renormalized — and the
color comes from the owning mesh.  Degenerate all-zero padding triangles
fail the det test.

Two layers:
  * ``mt_t``: candidate t for a (N rays) x (K tris) block — the inner tile
    kernel, also reused by the kd-tree leaf stage.
  * ``intersect_triangles_brute``: chunked scan over all triangles keeping a
    running (t, index) — bounded memory for large T; first-occurrence min
    matches the reference's lane scan tie-break (triangle.cpp:126-139).

Differentiability: winner index is stop-gradient; u, v, t are recomputed
analytically for the single gathered winner (``mt_single``), so gradients
flow to the hit triangle's vertices and normals only — the
save-prim-id/re-derive pattern from SURVEY.md §7.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.math import cross, dot, safe_div
from .ray import FamilyHit, INF


def mt_t_edges(A, e1, e2, o, d):
    """Candidate t from precomputed-edge SoA blocks.

    Args:
      A, e1, e2: (N, K, 3) per-ray triangle blocks (A, B-A, C-A).
      o, d: (N, 3) rays.
    Returns: t (N, K), +inf invalid (t > 0 enforced).
    """
    d_b = d[:, None, :]
    o_b = o[:, None, :]
    pvec = jnp.cross(d_b, e2)
    det = jnp.sum(pvec * e1, axis=-1)
    valid = jnp.abs(det) > 0.0
    inv_det = safe_div(jnp.ones_like(det), det, valid)
    tvec = o_b - A
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    valid &= (u > 0.0) & (u < 1.0)
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d_b * qvec, axis=-1) * inv_det
    valid &= (v > 0.0) & (u + v < 1.0)
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid &= t > 0.0
    return jnp.where(valid, t, INF)


def mt_t(verts, o, d, pairwise: bool = True):
    """Candidate t for rays x triangles.

    Args:
      verts: (K, 3, 3) or (N, K, 3, 3) triangle vertices [corner, xyz].
      o, d: (N, 3) rays.
    Returns:
      t: (N, K) with +inf where invalid (t > 0 enforced; caller clips).
    """
    A = verts[..., 0, :]
    B = verts[..., 1, :]
    C = verts[..., 2, :]
    if pairwise and verts.ndim == 3:
        A, B, C = A[None], B[None], C[None]  # (1, K, 3)
    ab = B - A
    ac = C - A
    d_b = d[:, None, :]
    o_b = o[:, None, :]
    pvec = jnp.cross(d_b, ac)
    det = jnp.sum(pvec * ab, axis=-1)
    valid = jnp.abs(det) > 0.0
    inv_det = safe_div(jnp.ones_like(det), det, valid)
    tvec = o_b - A
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    valid &= (u > 0.0) & (u < 1.0)
    qvec = jnp.cross(tvec, ab)
    v = jnp.sum(d_b * qvec, axis=-1) * inv_det
    valid &= (v > 0.0) & (u + v < 1.0)
    t = jnp.sum(ac * qvec, axis=-1) * inv_det
    valid &= t > 0.0
    return jnp.where(valid, t, INF)


def mt_single(tri, o, d, valid):
    """Differentiable (t, u, v) of one triangle per ray.

    Args:
      tri: (N, 3, 3) the gathered winning triangle per ray.
      valid: (N,) bool — where False, outputs are zeros (safe grads).
    """
    A, B, C = tri[:, 0, :], tri[:, 1, :], tri[:, 2, :]
    ab = B - A
    ac = C - A
    pvec = cross(d, ac)
    det = dot(pvec, ab)
    inv_det = safe_div(jnp.ones_like(det), det, valid)
    tvec = o - A
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, ab)
    v = dot(d, qvec) * inv_det
    t = dot(ac, qvec) * inv_det
    return t, u, v


def triangle_hit_attrs(tris, o, d, tri_idx, hit, mesh_colors=None):
    """Recompute hit attributes differentiably from the winning tri index.

    Returns FamilyHit with the reference's attribute semantics
    (triangle.cpp:169-174): unnormalized barycentric-blended smooth normal,
    mesh color.
    """
    idx = jnp.clip(tri_idx, 0, tris.verts.shape[0] - 1)
    tri = tris.verts[idx]  # (N, 3, 3)
    t, u, v = mt_single(tri, o, d, hit)
    t = jnp.where(hit, t, INF)
    w0 = 1.0 - (u + v)
    nrm = tris.normals[idx]  # (N, 3, 3) rows = AN, BN, CN
    normal = w0[:, None] * nrm[:, 0, :] + u[:, None] * nrm[:, 1, :] + v[:, None] * nrm[:, 2, :]
    if mesh_colors is None:
        color = jnp.zeros_like(normal)
    else:
        color = mesh_colors[tris.mesh_id[idx]]
    return FamilyHit(t=t, normal=normal, color=color)


def brute_force_closest(verts, o, d, chunk: int = 2048):
    """Scan all T triangles in fixed chunks; returns (t_best (N,), idx (N,)).

    Chunked running-min keeps peak memory at N*chunk; first-occurrence
    argmin within and across chunks preserves the reference's tie-break.
    """
    T = verts.shape[0]
    n = o.shape[0]
    pad = (-T) % chunk
    if pad:
        verts = jnp.concatenate([verts, jnp.zeros((pad, 3, 3), verts.dtype)], axis=0)
    num_chunks = (T + pad) // chunk
    verts_c = verts.reshape(num_chunks, chunk, 3, 3)

    def body(carry, chunk_verts):
        t_best, idx_best, base = carry
        t = mt_t(chunk_verts, o, d)  # (N, chunk)
        a = jnp.argmin(t, axis=1)
        t_c = jnp.take_along_axis(t, a[:, None], axis=1)[:, 0]
        better = t_c < t_best
        t_best = jnp.where(better, t_c, t_best)
        idx_best = jnp.where(better, base + a, idx_best)
        return (t_best, idx_best, base + chunk), None

    init = (jnp.full((n,), INF, jnp.float32), jnp.zeros((n,), jnp.int32), jnp.int32(0))
    (t_best, idx_best, _), _ = jax.lax.scan(body, init, verts_c)
    return t_best, idx_best


def intersect_triangles_brute(tris, mesh_colors, o, d, t_max, chunk: int = 2048) -> FamilyHit:
    t_best, idx = brute_force_closest(jax.lax.stop_gradient(tris.verts), o, d, chunk)
    hit = t_best < t_max
    return triangle_hit_attrs(tris, o, d, idx, hit, mesh_colors)


def occluded_triangles_brute(verts, o, d, t_max, chunk: int = 2048) -> jnp.ndarray:
    T = verts.shape[0]
    n = o.shape[0]
    pad = (-T) % chunk
    if pad:
        verts = jnp.concatenate([verts, jnp.zeros((pad, 3, 3), verts.dtype)], axis=0)
    verts_c = verts.reshape(-1, chunk, 3, 3)

    def body(carry, chunk_verts):
        t = mt_t(chunk_verts, o, d)
        return carry | jnp.any(t < t_max[:, None], axis=1), None

    out, _ = jax.lax.scan(body, jnp.zeros((n,), bool), verts_c)
    return out
