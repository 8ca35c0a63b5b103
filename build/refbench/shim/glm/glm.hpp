
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
