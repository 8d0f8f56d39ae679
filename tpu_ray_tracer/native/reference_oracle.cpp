// Independent reference oracle harness.
//
// Compiles the REFERENCE ray tracer's own header-only math core
// (/root/reference/include/surface_impl.h, light_impl.h — host-compilable,
// glm-only) plus its factory sources (src/surface.cpp, src/light.cpp,
// src/scene-exception.cpp) into a tiny stdin/stdout evaluator, so the
// repo's NumPy f64 golden oracle can be pinned to the reference's ACTUAL
// compiled code rather than to a re-implementation of it.
//
// Protocol (all binary, native-endian float64 on both directions):
//   [opcode] [payload...] -> [reply...]
// opcodes:
//   1  intersect_ray      in: coef[20] origin[3] dir[3]      out: t[1]
//   2  normal_vector      in: coef[20] pos[3]                out: n[3]
//   3  shadow_ray         in: is_sph[1] p[3] lcolor[3] pt[3] out: dir[3] max_t[1]
//   4  surface_color      in: is_sph[1] p[3] lcolor[3] pt[3] n[3] objc[3]
//                                                            out: rgb[3]
//   5  reflect_ray        in: dir[3] normal[3]               out: r[3]
//   6  SurfaceCoefs::sphere   in: center[3] radius[1]        out: coef[20]
//   7  SurfaceCoefs::plane    in: origin[3] normal[3]        out: coef[20]
//   8  SurfaceCoefs::dingDong in: origin[3]                  out: coef[20]
//   9  SurfaceCoefs::clebsch  in: -                          out: coef[20]
//   10 SurfaceCoefs::cayley   in: -                          out: coef[20]
//   11 LightSource::directional in: intensity[1] dir[3] color[3]
//                                            out: is_sph[1] p[3] lcolor[3]
//   12 LightSource::spherical   in: intensity[1] pos[3] color[3]
//                                            out: is_sph[1] p[3] lcolor[3]
//   0  quit
//
// SurfaceCoefs is a standard-layout struct of 20 contiguous doubles in the
// repo's monomial order (reference include/surface.h:10-15), so it round-
// trips through memcpy.

#include <cmath>
#include <cstdio>
#include <cstring>

#include "surface.h"
#include "surface_impl.h"
#include "light.h"
#include "light_impl.h"

static_assert(sizeof(SurfaceCoefs) == 20 * sizeof(double),
              "SurfaceCoefs must be 20 packed doubles");

static bool read_d(double *buf, size_t n) {
    return fread(buf, sizeof(double), n, stdin) == n;
}

static void write_d(const double *buf, size_t n) {
    fwrite(buf, sizeof(double), n, stdout);
    fflush(stdout);
}

static glm::dvec3 dvec(const double *p) {
    return glm::dvec3(p[0], p[1], p[2]);
}

static glm::vec3 fvec(const double *p) {
    return glm::vec3((float)p[0], (float)p[1], (float)p[2]);
}

static void put_dvec(double *out, const glm::dvec3 &v) {
    out[0] = v.x; out[1] = v.y; out[2] = v.z;
}

static void put_fvec(double *out, const glm::vec3 &v) {
    out[0] = v.x; out[1] = v.y; out[2] = v.z;
}

static LightSource read_light(const double *p) {
    LightSource l{};
    l.is_spherical = p[0] > 0.5;
    l.p = dvec(p + 1);
    l.light_color = fvec(p + 4);
    return l;
}

int main() {
    double in[32], out[20];
    double op;
    while (read_d(&op, 1)) {
        int code = (int)op;
        if (code == 0) break;
        switch (code) {
        case 1: {  // intersect_ray
            if (!read_d(in, 26)) return 1;
            SurfaceCoefs c;
            memcpy(&c, in, sizeof(c));
            out[0] = intersect_ray(c, dvec(in + 20), dvec(in + 23));
            write_d(out, 1);
            break;
        }
        case 2: {  // normal_vector
            if (!read_d(in, 23)) return 1;
            SurfaceCoefs c;
            memcpy(&c, in, sizeof(c));
            put_dvec(out, normal_vector(c, dvec(in + 20)));
            write_d(out, 3);
            break;
        }
        case 3: {  // shadow_ray
            if (!read_d(in, 10)) return 1;
            double max_t = 0.0;
            glm::vec3 dir = shadow_ray(read_light(in), dvec(in + 7), max_t);
            put_fvec(out, dir);
            out[3] = max_t;
            write_d(out, 4);
            break;
        }
        case 4: {  // surface_color
            if (!read_d(in, 16)) return 1;
            glm::vec3 rgb = surface_color(read_light(in), dvec(in + 7),
                                          dvec(in + 10), fvec(in + 13));
            put_fvec(out, rgb);
            write_d(out, 3);
            break;
        }
        case 5: {  // reflect_ray
            if (!read_d(in, 6)) return 1;
            put_dvec(out, reflect_ray(dvec(in), dvec(in + 3)));
            write_d(out, 3);
            break;
        }
        case 6: {
            if (!read_d(in, 4)) return 1;
            SurfaceCoefs c = SurfaceCoefs::sphere(dvec(in), in[3]);
            memcpy(out, &c, sizeof(c));
            write_d(out, 20);
            break;
        }
        case 7: {
            if (!read_d(in, 6)) return 1;
            SurfaceCoefs c = SurfaceCoefs::plane(dvec(in), dvec(in + 3));
            memcpy(out, &c, sizeof(c));
            write_d(out, 20);
            break;
        }
        case 8: {
            if (!read_d(in, 3)) return 1;
            SurfaceCoefs c = SurfaceCoefs::dingDong(dvec(in));
            memcpy(out, &c, sizeof(c));
            write_d(out, 20);
            break;
        }
        case 9: {
            SurfaceCoefs c = SurfaceCoefs::clebsch();
            memcpy(out, &c, sizeof(c));
            write_d(out, 20);
            break;
        }
        case 10: {
            SurfaceCoefs c = SurfaceCoefs::cayley();
            memcpy(out, &c, sizeof(c));
            write_d(out, 20);
            break;
        }
        case 11:
        case 12: {
            if (!read_d(in, 7)) return 1;
            LightSource l = (code == 11)
                ? LightSource::directional((float)in[0], dvec(in + 1),
                                           fvec(in + 4))
                : LightSource::spherical((float)in[0], dvec(in + 1),
                                         fvec(in + 4));
            out[0] = l.is_spherical ? 1.0 : 0.0;
            put_dvec(out + 1, l.p);
            put_fvec(out + 4, l.light_color);
            write_d(out, 7);
            break;
        }
        default:
            return 2;
        }
    }
    return 0;
}
