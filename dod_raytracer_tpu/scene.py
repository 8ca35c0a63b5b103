"""Scene description and device-tensor scene representation.

The reference keeps *global SoA registries* per shape family, appended to by
``create()`` calls (sphere.cpp:226-242, plane.cpp:204-222, cylinder.cpp:211-216,
triangle.cpp:262-292), with no scene object at all.  The TPU-native design
replaces the mutable registries with an explicit two-stage model:

* ``SceneBuilder`` — host-side, mirrors the ``create()`` API (one call per
  primitive, returns the primitive id) and accumulates plain Python lists.
* ``Scene`` — an immutable jit-friendly pytree of flat device arrays, built
  once by ``SceneBuilder.build()``; optionally carries kd-tree arrays.

Empty families are padded with one provably-miss primitive each so every
kernel sees static non-zero shapes (XLA requirement), chosen so the
reference's own validity masks reject them:
  sphere  radius=0              -> d2 < r^2 strict can never pass
  plane   normal=0              -> |denom| > eps can never pass
  cylinder base=BIG             -> cap/body t out of range
  triangle all-zero vertices    -> det == 0 rejected (triangle.cpp:73)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct

_PAD_BIG = 1.0e30


@struct.dataclass
class Spheres:
    """SoA sphere registry: reference SphereLane + attrs (sphere.cpp:12-23).

    ``radius`` is stored un-squared (reference stores radius^2) so that it is
    a directly differentiable scene parameter; kernels square it on the fly.
    """

    center: jnp.ndarray  # (S, 3) f32
    radius: jnp.ndarray  # (S,) f32
    color: jnp.ndarray  # (S, 3) f32


@struct.dataclass
class Planes:
    """SoA infinite-plane registry (plane.cpp:11-20)."""

    point: jnp.ndarray  # (P, 3) f32
    normal: jnp.ndarray  # (P, 3) f32 — stored as given, NOT normalized (parity)
    color: jnp.ndarray  # (P, 3) f32


@struct.dataclass
class Cylinders:
    """Finite capped cylinders (cylinder.h:8-41). ``axis`` normalized at
    creation, matching the Cylinder constructor (cylinder.cpp:224-230)."""

    base: jnp.ndarray  # (C, 3) f32
    axis: jnp.ndarray  # (C, 3) f32, unit
    radius: jnp.ndarray  # (C,) f32
    height: jnp.ndarray  # (C,) f32
    color: jnp.ndarray  # (C, 3) f32


@struct.dataclass
class Triangles:
    """Flat triangle soup: reference TriangleLane + Attributes
    (triangle.h:33-51) as ``(T, 3, 3)`` device tensors."""

    verts: jnp.ndarray  # (T, 3, 3) f32 — [tri, corner(A/B/C), xyz]
    normals: jnp.ndarray  # (T, 3, 3) f32 — per-vertex smooth normals
    mesh_id: jnp.ndarray  # (T,) i32 — index into mesh_colors


@struct.dataclass
class Lights:
    """Point lights {position, intensity} (light.h:4-8)."""

    position: jnp.ndarray  # (L, 3) f32
    intensity: jnp.ndarray  # (L,) f32


@struct.dataclass
class KDArrays:
    """Flat kd-tree: the reference's packed 8-byte nodes (kdtree.h:39-47)
    unpacked into parallel arrays, plus the leaf-contiguous triangle
    permutation produced by ``Triangle::reorderLanesByIndices``
    (triangle.cpp:349-367) expressed as a gather index instead of a
    physical reorder so gradients flow back to the original vertex array."""

    node_flag: jnp.ndarray  # (M,) i32 — 0/1/2 split axis, 3 leaf
    node_split: jnp.ndarray  # (M,) f32 — split offset (interior)
    node_right: jnp.ndarray  # (M,) i32 — right child index (interior)
    node_leaf_start: jnp.ndarray  # (M,) i32 — first lane in perm (leaf)
    node_leaf_lanes: jnp.ndarray  # (M,) i32 — lane count (leaf)
    bounds_min: jnp.ndarray  # (3,) f32 — world bound (kdtree.cpp:78-91)
    bounds_max: jnp.ndarray  # (3,) f32
    tri_perm: jnp.ndarray  # (K*lane,) i32 — original-tri index per reordered slot, -1 pad
    # blocked leaf-major layout (TPU fast path): leaves are aligned to
    # block_lanes-lane blocks; block_orig[b, j] is the original tri id of
    # slot j in block b (-1 empty), block_tris the pre-gathered [A|e1|e2]
    # rows so a leaf chunk fetch is ONE contiguous row gather per ray.
    block_orig: Optional[jnp.ndarray] = None  # (B, block_lanes*lane) i32
    block_tris: Optional[jnp.ndarray] = None  # (B, block_lanes*lane, 9) f32
    # per-block Plücker matrices for the block-loop Pallas leaf kernel
    block_g: Optional[jnp.ndarray] = None  # (B, 16, 5*Spad) f32
    # per-block vertex AABB [minx,miny,minz,maxx,maxy,maxz] — tighter than
    # the kd cell; lets the packet kernel skip blocks no ray's segment can
    # touch before paying the DMA + matmul (packet_kernel.py)
    block_aabb: Optional[jnp.ndarray] = None  # (6, B) f32
    # treelet forest (trees too big for one VMEM-resident table): preorder
    # subtree cuts of <= MAX_NODES nodes with treelet-local child links,
    # plus the compact top tree whose super-leaves index the treelets
    # (accel/_kdtree_np.py cut_treelets / pack_treelet_tables /
    # build_top_table; consumed by ops/pallas/forest_kernel.py)
    tre_tbl: Optional[jnp.ndarray] = None  # (T, cap, 128) f32
    top_tbl: Optional[jnp.ndarray] = None  # (Ttop_pad, 128) f32
    lane_size: int = struct.field(pytree_node=False, default=8)
    num_lanes: int = struct.field(pytree_node=False, default=0)  # reordered lane count K
    max_leaf_lanes: int = struct.field(pytree_node=False, default=0)
    block_lanes: int = struct.field(pytree_node=False, default=0)
    # build depth budget (kdtree.cpp:72) — bounds traversal stack occupancy,
    # letting the runtime shrink the (stack_depth, N) worklist arrays
    max_depth: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class Scene:
    spheres: Spheres
    planes: Planes
    cylinders: Cylinders
    triangles: Triangles
    mesh_colors: jnp.ndarray  # (M, 3) f32
    lights: Lights
    kd: Optional[KDArrays] = None
    # numbers of *real* (non-padding) primitives; static so masks fold away
    n_spheres: int = struct.field(pytree_node=False, default=0)
    n_planes: int = struct.field(pytree_node=False, default=0)
    n_cylinders: int = struct.field(pytree_node=False, default=0)
    n_triangles: int = struct.field(pytree_node=False, default=0)
    n_lights: int = struct.field(pytree_node=False, default=0)


class SceneBuilder:
    """Host-side scene assembly mirroring the reference ``create()`` APIs."""

    def __init__(self):
        self._spheres: list = []
        self._planes: list = []
        self._cylinders: list = []
        self._tri_verts: list = []
        self._tri_normals: list = []
        self._tri_mesh: list = []
        self._mesh_colors: list = []
        self._lights: list = []

    # --- registries -------------------------------------------------------
    def add_sphere(self, position, radius, color) -> int:
        """Sphere::create (sphere.cpp:226-242)."""
        self._spheres.append((np.asarray(position, np.float32), np.float32(radius), np.asarray(color, np.float32)))
        return len(self._spheres) - 1

    def add_plane(self, position, normal, color) -> int:
        """Plane::create (plane.cpp:204-222). Normal stored as given."""
        self._planes.append((np.asarray(position, np.float32), np.asarray(normal, np.float32), np.asarray(color, np.float32)))
        return len(self._planes) - 1

    def add_cylinder(self, base, axis, radius, height, color) -> int:
        """Cylinder::create (cylinder.cpp:211-216); axis normalized here
        as in the Cylinder constructor (cylinder.cpp:224-230)."""
        axis = np.asarray(axis, np.float64)
        axis = (axis / np.linalg.norm(axis)).astype(np.float32)
        self._cylinders.append((np.asarray(base, np.float32), axis, np.float32(radius), np.float32(height), np.asarray(color, np.float32)))
        return len(self._cylinders) - 1

    def add_mesh(self, verts, normals, color=(0.1, 0.8, 0.3)) -> int:
        """Mesh::Create equivalent (mesh.cpp:9-50): ``verts``/(``normals``)
        are (T, 3, 3) arrays of already-triangulated faces with per-vertex
        smooth normals; default color matches mesh.cpp:23."""
        verts = np.asarray(verts, np.float32)
        normals = np.asarray(normals, np.float32)
        assert verts.ndim == 3 and verts.shape[1:] == (3, 3), verts.shape
        assert normals.shape == verts.shape
        mesh_id = len(self._mesh_colors)
        self._mesh_colors.append(np.asarray(color, np.float32))
        self._tri_verts.append(verts)
        self._tri_normals.append(normals)
        self._tri_mesh.append(np.full((verts.shape[0],), mesh_id, np.int32))
        return mesh_id

    def add_light(self, position, intensity) -> int:
        self._lights.append((np.asarray(position, np.float32), np.float32(intensity)))
        return len(self._lights) - 1

    # --- build ------------------------------------------------------------
    def build(self, cfg=None) -> Scene:
        from .config import Config

        cfg = cfg or Config()

        n_s, n_p, n_c, n_l = (len(self._spheres), len(self._planes), len(self._cylinders), len(self._lights))

        if self._spheres:
            sc = np.stack([s[0] for s in self._spheres])
            sr = np.array([s[1] for s in self._spheres], np.float32)
            scol = np.stack([s[2] for s in self._spheres])
        else:
            sc = np.zeros((1, 3), np.float32)
            sr = np.zeros((1,), np.float32)
            scol = np.zeros((1, 3), np.float32)

        if self._planes:
            pp = np.stack([p[0] for p in self._planes])
            pn = np.stack([p[1] for p in self._planes])
            pcol = np.stack([p[2] for p in self._planes])
        else:
            pp = np.zeros((1, 3), np.float32)
            pn = np.zeros((1, 3), np.float32)  # zero normal -> always miss
            pcol = np.zeros((1, 3), np.float32)

        if self._cylinders:
            cb = np.stack([c[0] for c in self._cylinders])
            ca = np.stack([c[1] for c in self._cylinders])
            cr = np.array([c[2] for c in self._cylinders], np.float32)
            ch = np.array([c[3] for c in self._cylinders], np.float32)
            ccol = np.stack([c[4] for c in self._cylinders])
        else:
            # Padding values must stay finite in every intermediate (squares,
            # cross terms) or 0*inf=NaN poisons backward cotangents; the
            # static n_cylinders mask in intersect_cylinders rejects them.
            cb = np.array([[0.0, 1.0e3, 0.0]], np.float32)
            ca = np.tile(np.array([0, 0, 1], np.float32), (1, 1))
            cr = np.zeros((1,), np.float32)
            ch = np.ones((1,), np.float32)
            ccol = np.zeros((1, 3), np.float32)

        if self._tri_verts:
            tv = np.concatenate(self._tri_verts, axis=0)
            tn = np.concatenate(self._tri_normals, axis=0)
            tm = np.concatenate(self._tri_mesh, axis=0)
        else:
            tv = np.zeros((1, 3, 3), np.float32)  # degenerate: det == 0
            tn = np.zeros((1, 3, 3), np.float32)
            tm = np.zeros((1,), np.int32)
        n_t = sum(v.shape[0] for v in self._tri_verts)

        mcol = np.stack(self._mesh_colors) if self._mesh_colors else np.zeros((1, 3), np.float32)

        if self._lights:
            lp = np.stack([l[0] for l in self._lights])
            li = np.array([l[1] for l in self._lights], np.float32)
        else:
            lp = np.zeros((1, 3), np.float32)
            li = np.zeros((1,), np.float32)

        kd = None
        if cfg.use_kdtree and n_t > 0:
            from .accel.kdtree import build_kdtree

            kd = build_kdtree(tv, cfg)

        return Scene(
            spheres=Spheres(jnp.asarray(sc), jnp.asarray(sr), jnp.asarray(scol)),
            planes=Planes(jnp.asarray(pp), jnp.asarray(pn), jnp.asarray(pcol)),
            cylinders=Cylinders(jnp.asarray(cb), jnp.asarray(ca), jnp.asarray(cr), jnp.asarray(ch), jnp.asarray(ccol)),
            triangles=Triangles(jnp.asarray(tv), jnp.asarray(tn), jnp.asarray(tm)),
            mesh_colors=jnp.asarray(mcol),
            lights=Lights(jnp.asarray(lp), jnp.asarray(li)),
            kd=kd,
            n_spheres=n_s,
            n_planes=n_p,
            n_cylinders=n_c,
            n_triangles=n_t,
            n_lights=n_l,
        )


def default_scene(seed: int = 0, cfg=None, num_spheres: int = 16, with_cylinder: bool = True,
                  mesh: Optional[str] = "dragon") -> SceneBuilder:
    """The reference's hardcoded scene recipe (main.cpp:26-146,283-292) with
    a seeded PRNG replacing ``srand(time(NULL))`` (main.cpp:351).

    16 unit spheres at uniform [-5,5]^3 with random colors; six walls of a
    +-5 box with the reference's fixed colors; one tilted capped cylinder;
    optional mesh; the 9 hardcoded point lights from rayTrace
    (main.cpp:283-292).
    """
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    for _ in range(num_spheres):
        color = rng.random(3, dtype=np.float32)
        pos = rng.random(3, dtype=np.float32) * 10.0 - 5.0
        b.add_sphere(pos, 1.0, color)
    walls = [  # main.cpp:54-103 (normal, position, color)
        ((0.0, 0.0, -1.0), (0.0, 0.0, 5.0), (0.195, 0.410, 0.610)),
        ((0.0, 0.0, 1.0), (0.0, 0.0, -5.0), (0.493, 0.265, 0.590)),
        ((0.0, -1.0, 0.0), (0.0, 5.0, 0.0), (0.276, 0.600, 0.411)),
        ((0.0, 1.0, 0.0), (0.0, -5.0, 0.0), (0.292, 0.680, 0.674)),
        ((1.0, 0.0, 0.0), (-5.0, 0.0, 0.0), (0.720, 0.288, 0.389)),
        ((-1.0, 0.0, 0.0), (5.0, 0.0, 0.0), (0.680, 0.224, 0.224)),
    ]
    for normal, position, color in walls:
        b.add_plane(position, normal, color)
    if with_cylinder:
        b.add_cylinder(base=(-2.0, 0.0, 2.0), axis=(2.2, 5.0, 2.0), radius=1.5,
                       height=4.0, color=rng.random(3, dtype=np.float32))
    if mesh is not None:
        from .mesh import load_mesh_asset

        verts, normals = load_mesh_asset(mesh)
        b.add_mesh(verts, normals)
    for position, intensity in reference_lights():
        b.add_light(position, intensity)
    return b


def reference_lights() -> Sequence[Any]:
    """The 9 hardcoded point lights (main.cpp:283-292)."""
    return [
        ((0.0, 0.0, -2.0), 3.0),
        ((4.0, 4.3, 3.3), 1.0),
        ((-4.0, -2.95, 3.95), 1.0),
        ((3.95, -4.2, 3.3), 1.0),
        ((-2.9, 4.2, 3.8), 1.0),
        ((3.95, 2.8, -4.3), 1.0),
        ((-3.0, -3.8, -3.3), 1.0),
        ((4.2, -4.2, -3.4), 1.0),
        ((-2.9, 4.4, -3.5), 1.0),
    ]
