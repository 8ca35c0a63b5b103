#!/usr/bin/env python
"""Build and run the C++ reference for a pixel cross-check.

The reference's CMake build is unbuildable in this environment: it
FetchContent-clones glm and assimp from GitHub at configure time and the
container has zero egress (documented attempt: `cmake -B build` fails in
FetchContent_Populate).  This script builds the reference anyway by
substituting the two third-party dependencies with minimal local shims:

* glm  -> a ~120-line header implementing exactly the subset the
  reference uses (vec<3,T,Q>, u8vec3, mat3-from-columns, dot/cross/
  normalize/reflect/length/min/max/clamp/pow, componentwise operators),
  with glm's own semantics (normalize = v * (1/sqrt(dot)), reflect(I,N) =
  I - 2*dot(N,I)*N, u8 conversion by static_cast).
* assimp -> stub headers plus a replacement mesh.cpp whose Mesh::Create
  reads a plain-text triangle soup (18 floats/line: A B C AN BN CN)
  instead of an OBJ.  The caller exports that file from this repo's mesh
  pipeline, so both renderers consume IDENTICAL geometry and smooth
  normals and the cross-check isolates intersection/shading/integration.
  (assets/dragon.obj is a stripped blob upstream, so the stock binary
  could not have loaded its mesh either.)

Reference *source* files are compiled from /root/reference verbatim
except for three string patches applied to a temp copy of main.cpp:
  1. srand(time(NULL)) -> fixed seed + open a scene-dump file
     (main.cpp:351 nondeterminism, SURVEY.md §2 #22);
  2. dump each generated sphere / the cylinder color to scene_dump.csv so
     the comparison scene uses the exact same random parameters;
  3. the mesh path assets/dragon.obj -> <workdir>/mesh.tris.

Usage: python scripts/build_reference.py WORKDIR [--width W --height H]
Builds WORKDIR/dod_ref; running it in WORKDIR writes output.png and
scene_dump.csv there.  Exits nonzero (with the compiler log) on failure.
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import subprocess
import sys

REF = pathlib.Path("/root/reference")

GLM_HPP = r"""
#pragma once
#include <cmath>
#include <cstdint>
#include <cassert>  // real glm pulls this in transitively; kdtree.cpp relies on it
#include <algorithm>
namespace glm {
using length_t = int;
enum qualifier { defaultp };
template<length_t L, typename T, qualifier Q = defaultp> struct vec;

template<typename T, qualifier Q>
struct vec<3, T, Q> {
    T x{}, y{}, z{};
    constexpr vec() = default;
    constexpr explicit vec(T s) : x(s), y(s), z(s) {}
    template<typename A, typename B, typename C>
    constexpr vec(A a, B b, C c)
        : x(static_cast<T>(a)), y(static_cast<T>(b)), z(static_cast<T>(c)) {}
    template<typename U, qualifier P>
    constexpr vec(const vec<3, U, P>& o)
        : x(static_cast<T>(o.x)), y(static_cast<T>(o.y)), z(static_cast<T>(o.z)) {}
    static constexpr length_t length() { return 3; }
    constexpr T& operator[](length_t i) { return i == 0 ? x : (i == 1 ? y : z); }
    constexpr const T& operator[](length_t i) const { return i == 0 ? x : (i == 1 ? y : z); }
    constexpr vec& operator+=(const vec& o) { x += o.x; y += o.y; z += o.z; return *this; }
    constexpr vec& operator-=(const vec& o) { x -= o.x; y -= o.y; z -= o.z; return *this; }
    constexpr vec& operator*=(T s) { x *= s; y *= s; z *= s; return *this; }
    constexpr vec& operator/=(T s) { x /= s; y /= s; z /= s; return *this; }
};
using vec3 = vec<3, float, defaultp>;
using u8vec3 = vec<3, std::uint8_t, defaultp>;

template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator+(const vec<3,T,Q>& a, const vec<3,T,Q>& b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator-(const vec<3,T,Q>& a, const vec<3,T,Q>& b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator-(const vec<3,T,Q>& a) { return {-a.x, -a.y, -a.z}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator*(const vec<3,T,Q>& a, const vec<3,T,Q>& b) { return {a.x*b.x, a.y*b.y, a.z*b.z}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator*(const vec<3,T,Q>& a, T s) { return {a.x*s, a.y*s, a.z*s}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator*(T s, const vec<3,T,Q>& a) { return {s*a.x, s*a.y, s*a.z}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator/(const vec<3,T,Q>& a, T s) { return {a.x/s, a.y/s, a.z/s}; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> operator/(const vec<3,T,Q>& a, const vec<3,T,Q>& b) { return {a.x/b.x, a.y/b.y, a.z/b.z}; }

template<typename T, qualifier Q>
constexpr T dot(const vec<3,T,Q>& a, const vec<3,T,Q>& b) { return a.x*b.x + a.y*b.y + a.z*b.z; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> cross(const vec<3,T,Q>& a, const vec<3,T,Q>& b) {
    return {a.y*b.z - a.z*b.y, a.z*b.x - a.x*b.z, a.x*b.y - a.y*b.x};
}
template<typename T, qualifier Q>
inline T length(const vec<3,T,Q>& v) { return std::sqrt(dot(v, v)); }
template<typename T, qualifier Q>
inline vec<3,T,Q> normalize(const vec<3,T,Q>& v) { return v * (T(1) / std::sqrt(dot(v, v))); }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> reflect(const vec<3,T,Q>& I, const vec<3,T,Q>& N) {
    return I - N * (T(2) * dot(N, I));
}
template<typename T> constexpr T min(T a, T b) { return b < a ? b : a; }
template<typename T> constexpr T max(T a, T b) { return a < b ? b : a; }
template<typename T, qualifier Q>
constexpr vec<3,T,Q> clamp(const vec<3,T,Q>& v, const vec<3,T,Q>& lo, const vec<3,T,Q>& hi) {
    return {min(max(v.x, lo.x), hi.x), min(max(v.y, lo.y), hi.y), min(max(v.z, lo.z), hi.z)};
}
template<typename T, typename P> inline T pow(T base, P e) { return std::pow(base, static_cast<T>(e)); }

struct mat3 {
    vec3 c0, c1, c2;  // column-major, like glm
    constexpr mat3(const vec3& a, const vec3& b, const vec3& c) : c0(a), c1(b), c2(c) {}
    constexpr vec3 operator*(const vec3& v) const { return c0*v.x + c1*v.y + c2*v.z; }
};
}  // namespace glm
"""

FWD_HEADERS = {
    "glm/glm.hpp": GLM_HPP,
    "glm/common.hpp": '#pragma once\n#include "glm/glm.hpp"\n',
    "glm/fwd.hpp": '#pragma once\n#include "glm/glm.hpp"\n',
    "glm/geometric.hpp": '#pragma once\n#include "glm/glm.hpp"\n',
    "assimp/vector3.h": ("#pragma once\nstruct aiVector3D { float x, y, z;\n"
                         "  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }\n"
                         "};\n"),
    "assimp/mesh.h": "#pragma once\n",
    "assimp/Importer.hpp": "#pragma once\nnamespace Assimp { struct Importer {}; }\n",
}

MESH_STUB = r"""
// Replacement for the assimp-based loader: reads a plain-text triangle
// soup (18 floats per line: Ax Ay Az Bx By Bz Cx Cy Cz ANx ... CNz) that
// the comparison harness exports from the TPU repo's mesh pipeline, so
// both renderers consume identical geometry and smooth normals.
#include "mesh.h"
#include "triangle.h"
#include <cstdio>

void Mesh::Create(_Create &createStruct)
{
    FILE *f = fopen(createStruct.loadPath.c_str(), "r");
    if (!f)
    {
        printf("Missing or empty mesh after assimp loading!\n");
        return;
    }
    Mesh::Attributes meshAttrs = {};
    meshAttrs.color = {0.1, 0.8, 0.3};
    m_meshAttributes.push_back(meshAttrs);

    Triangle::_Create t = {};
    float v[18];
    while (fscanf(f,
        "%f %f %f %f %f %f %f %f %f %f %f %f %f %f %f %f %f %f",
        &v[0], &v[1], &v[2], &v[3], &v[4], &v[5], &v[6], &v[7], &v[8],
        &v[9], &v[10], &v[11], &v[12], &v[13], &v[14], &v[15], &v[16],
        &v[17]) == 18)
    {
        t.A = {v[0], v[1], v[2]};
        t.B = {v[3], v[4], v[5]};
        t.C = {v[6], v[7], v[8]};
        t.AN = {v[9], v[10], v[11]};
        t.BN = {v[12], v[13], v[14]};
        t.CN = {v[15], v[16], v[17]};
        Triangle::create(t);
    }
    fclose(f);
}
"""

# --- string patches applied to the temp copy of main.cpp -----------------
PATCHES = [
    # fixed seed + scene-parameter dump (replaces main.cpp:351)
    ("    srand(time(NULL));",
     '    srand(12345u);\n'
     '    g_sceneDump = fopen("scene_dump.csv", "w");'),
    # global dump handle, declared before the generate* functions
    ("void generateSpheres(std::vector<unsigned> &sphereIds, unsigned numSpheres)",
     "static FILE *g_sceneDump;\n\n"
     "void generateSpheres(std::vector<unsigned> &sphereIds, unsigned numSpheres)"),
    ("        sphereIds.emplace_back(Sphere::create(createStruct));",
     '        if (g_sceneDump) fprintf(g_sceneDump,\n'
     '            "sphere,%.9g,%.9g,%.9g,%.9g,%.9g,%.9g,%.9g\\n",\n'
     '            dist_x, dist_y, dist_z, radius, r, g, b);\n'
     "        sphereIds.emplace_back(Sphere::create(createStruct));"),
    ("    Cylinder::create(createInfo);",
     '    if (g_sceneDump) { fprintf(g_sceneDump, "cylinder,%.9g,%.9g,%.9g\\n",\n'
     "        createInfo.attributes.color.x, createInfo.attributes.color.y,\n"
     "        createInfo.attributes.color.z); fflush(g_sceneDump); }\n"
     "    Cylinder::create(createInfo);"),
    # mesh source: text triangle soup exported by the harness
    ('basePath + "/assets/dragon.obj"', 'basePath + "/mesh.tris"'),
]


def build(workdir: pathlib.Path) -> pathlib.Path:
    src = workdir / "src"
    if src.exists():
        shutil.rmtree(src)
    shutil.copytree(REF / "src", src)

    shim = workdir / "shim"
    for rel, text in FWD_HEADERS.items():
        p = shim / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(text)

    main_cpp = src / "main.cpp"
    code = main_cpp.read_text()
    for old, new in PATCHES:
        if old not in code:
            sys.exit(f"patch anchor not found in main.cpp: {old!r}")
        code = code.replace(old, new)
    main_cpp.write_text(code)
    (src / "shapes" / "mesh.cpp").write_text(MESH_STUB)

    exe = workdir / "dod_ref"
    cmd = [
        "g++", "-std=c++20", "-O2", "-march=native",
        # g++-10's <string> leaked <algorithm> into config_loader.h's
        # unqualified remove_if; force-include it under g++-12
        "-include", "algorithm",
        f"-I{shim}", f"-I{src}", f"-I{src}/shapes", f"-I{src}/utils",
        f"-I{src}/accelerators",
        str(main_cpp), str(src / "shapes" / "mesh.cpp"),
        *(str(p) for p in sorted((src / "shapes").glob("*.cpp"))
          if p.name not in ("mesh.cpp",) and str(p) != str(main_cpp)),
        str(src / "accelerators" / "kdtree.cpp"),
        "-lpthread", "-o", str(exe),
    ]
    # dedupe while keeping order (mesh stub listed explicitly above)
    seen, args = set(), []
    for a in cmd:
        if a in seen and a.endswith(".cpp"):
            continue
        seen.add(a)
        args.append(a)
    res = subprocess.run(args, capture_output=True, text=True)
    if res.returncode != 0:
        sys.stderr.write(res.stderr)
        sys.exit("reference build failed")
    return exe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--height", type=int, default=180)
    args = ap.parse_args()
    wd = pathlib.Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    exe = build(wd)
    (wd / "config.ini").write_text(
        f"Width: {args.width}\nHeight: {args.height}\n")
    print(str(exe))


if __name__ == "__main__":
    main()
