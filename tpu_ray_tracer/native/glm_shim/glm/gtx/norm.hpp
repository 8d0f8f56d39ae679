// Shim for <glm/gtx/norm.hpp>: the reference's light_impl.h uses only
// glm::length2 from this extension header.
#pragma once

#include "../glm.hpp"

namespace glm {

template <typename T>
inline T length2(const tvec3<T> &v) {
    return dot(v, v);
}

}  // namespace glm
