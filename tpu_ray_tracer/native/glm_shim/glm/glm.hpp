// Minimal glm shim: just enough of the glm API surface for the REFERENCE
// ray-tracer's host-compilable math headers (/root/reference/include/
// surface_impl.h, light_impl.h, surface.h, light.h, scene-exception.h and
// the factory sources) to compile unmodified on a host without glm
// installed. Semantics follow upstream glm where it matters numerically:
// normalize(v) = v * (1/sqrt(dot(v, v))) (inversesqrt formulation), and
// vector-type conversions are implicit (glm's default, relied on by
// light_impl.h:17-27 returning dvec3 expressions as vec3).
//
// This is NOT a general glm replacement — only the entry points the
// reference headers use are provided, so any drift in what they need is a
// compile error, not silent misbehavior.
#pragma once

#include <cmath>

namespace glm {

template <typename T>
struct tvec3 {
    T x, y, z;
    tvec3() : x(0), y(0), z(0) {}
    explicit tvec3(T s) : x(s), y(s), z(s) {}
    tvec3(T a, T b, T c) : x(a), y(b), z(c) {}
    template <typename U>
    tvec3(const tvec3<U> &o) : x(T(o.x)), y(T(o.y)), z(T(o.z)) {}
};

typedef tvec3<float> vec3;
typedef tvec3<double> dvec3;

template <typename T>
inline tvec3<T> operator+(const tvec3<T> &a, const tvec3<T> &b) {
    return tvec3<T>(a.x + b.x, a.y + b.y, a.z + b.z);
}
template <typename T>
inline tvec3<T> operator-(const tvec3<T> &a, const tvec3<T> &b) {
    return tvec3<T>(a.x - b.x, a.y - b.y, a.z - b.z);
}
template <typename T>
inline tvec3<T> operator*(const tvec3<T> &a, const tvec3<T> &b) {
    return tvec3<T>(a.x * b.x, a.y * b.y, a.z * b.z);
}
template <typename T>
inline tvec3<T> operator*(T s, const tvec3<T> &a) {
    return tvec3<T>(s * a.x, s * a.y, s * a.z);
}
template <typename T>
inline tvec3<T> operator*(const tvec3<T> &a, T s) {
    return tvec3<T>(a.x * s, a.y * s, a.z * s);
}
template <typename T>
inline tvec3<T> operator/(const tvec3<T> &a, T s) {
    return tvec3<T>(a.x / s, a.y / s, a.z / s);
}
template <typename T>
inline tvec3<T> operator-(const tvec3<T> &a) {
    return tvec3<T>(-a.x, -a.y, -a.z);
}

template <typename T>
inline T dot(const tvec3<T> &a, const tvec3<T> &b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
template <typename T>
inline T length(const tvec3<T> &v) {
    return std::sqrt(dot(v, v));
}
template <typename T>
inline tvec3<T> normalize(const tvec3<T> &v) {
    return v * (T(1) / std::sqrt(dot(v, v)));
}

inline float max(float a, float b) { return a > b ? a : b; }
inline double max(double a, double b) { return a > b ? a : b; }
inline double pow(double a, double b) { return std::pow(a, b); }

}  // namespace glm
