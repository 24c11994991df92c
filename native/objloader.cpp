// Native OBJ loader for mitsuba3_experiments_tpu (scene/native.py bridge).
//
// Role: the host-side native tier of the framework (SURVEY.md section 2.2
// "Mitsuba scene graph + loaders") — the Python fallback in scene/obj.py is
// authoritative for semantics; this is the drop-in fast path for the
// bedroom-scale meshes (~2M triangles across 70 OBJs).
//
// ABI (see scene/native.py):
//   int  m3t_load_obj(path, void** handle, int64* nv, int64* nf,
//                     int* has_normals, int* has_uvs)    -> 0 on success
//   void m3t_copy_mesh(handle, float* v, float* n, float* uv, int32* f)
//   void m3t_free_mesh(handle)
//
// Semantics mirror scene/obj.py::_load_obj_py: corners are split per unique
// v/vt/vn triple, polygon fans are triangulated, negative indices resolve
// relative to the current counts.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Mesh {
    std::vector<float> pos;   // 3 * n_verts
    std::vector<float> nrm;   // 3 * n_verts
    std::vector<float> uv;    // 2 * n_verts
    std::vector<int32_t> faces;  // 3 * n_faces
    bool has_normals = false;
    bool has_uvs = false;
};

struct CornerKey {
    int v, t, n;
    bool operator==(const CornerKey& o) const {
        return v == o.v && t == o.t && n == o.n;
    }
};

struct CornerHash {
    size_t operator()(const CornerKey& k) const {
        size_t h = (size_t)k.v * 0x9E3779B97F4A7C15ull;
        h ^= (size_t)(k.t + 1) * 0xC2B2AE3D27D4EB4Full + (h << 6);
        h ^= (size_t)(k.n + 1) * 0x165667B19E3779F9ull + (h << 6);
        return h;
    }
};

// parse one index of an "f" corner like "12/3/4", "12//4", "12"
inline void parse_corner(const char* s, int& vi, int& ti, int& ni) {
    vi = ti = ni = 0;
    vi = (int)strtol(s, (char**)&s, 10);
    if (*s == '/') {
        ++s;
        if (*s != '/') ti = (int)strtol(s, (char**)&s, 10);
        if (*s == '/') {
            ++s;
            ni = (int)strtol(s, (char**)&s, 10);
        }
    }
}

}  // namespace

extern "C" {

int m3t_load_obj(const char* path, void** handle, int64_t* n_verts,
                 int64_t* n_faces, int* has_normals, int* has_uvs) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;

    std::vector<float> P, N, T;  // raw v / vn / vt records
    auto* mesh = new Mesh();
    std::unordered_map<CornerKey, int32_t, CornerHash> cache;
    cache.reserve(1 << 16);

    char line[4096];
    std::vector<int32_t> fan;
    while (fgets(line, sizeof(line), f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                P.push_back(x); P.push_back(y); P.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 'n') {
            float x, y, z;
            if (sscanf(line + 3, "%f %f %f", &x, &y, &z) == 3) {
                N.push_back(x); N.push_back(y); N.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 't') {
            float u, v;
            if (sscanf(line + 3, "%f %f", &u, &v) == 2) {
                T.push_back(u); T.push_back(v);
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            fan.clear();
            char* s = line + 2;
            while (*s) {
                while (*s == ' ' || *s == '\t') ++s;
                if (*s == '\n' || *s == '\r' || *s == 0) break;
                int vi, ti, ni;
                parse_corner(s, vi, ti, ni);
                while (*s && *s != ' ' && *s != '\n' && *s != '\r') ++s;

                int nP = (int)(P.size() / 3);
                int nT = (int)(T.size() / 2);
                int nN = (int)(N.size() / 3);
                int v = vi > 0 ? vi - 1 : nP + vi;
                int t = ti > 0 ? ti - 1 : (ti < 0 ? nT + ti : -1);
                int n = ni > 0 ? ni - 1 : (ni < 0 ? nN + ni : -1);
                if (v < 0 || v >= nP) continue;

                CornerKey key{v, t, n};
                auto it = cache.find(key);
                int32_t idx;
                if (it == cache.end()) {
                    idx = (int32_t)(mesh->pos.size() / 3);
                    cache.emplace(key, idx);
                    mesh->pos.push_back(P[3 * v]);
                    mesh->pos.push_back(P[3 * v + 1]);
                    mesh->pos.push_back(P[3 * v + 2]);
                    if (n >= 0 && n < nN) {
                        mesh->nrm.push_back(N[3 * n]);
                        mesh->nrm.push_back(N[3 * n + 1]);
                        mesh->nrm.push_back(N[3 * n + 2]);
                        mesh->has_normals = true;
                    } else {
                        mesh->nrm.push_back(0); mesh->nrm.push_back(0);
                        mesh->nrm.push_back(0);
                    }
                    if (t >= 0 && t < nT) {
                        mesh->uv.push_back(T[2 * t]);
                        mesh->uv.push_back(T[2 * t + 1]);
                        mesh->has_uvs = true;
                    } else {
                        mesh->uv.push_back(0); mesh->uv.push_back(0);
                    }
                } else {
                    idx = it->second;
                }
                fan.push_back(idx);
            }
            for (size_t k = 1; k + 1 < fan.size(); ++k) {
                mesh->faces.push_back(fan[0]);
                mesh->faces.push_back(fan[k]);
                mesh->faces.push_back(fan[k + 1]);
            }
        }
    }
    fclose(f);

    // normalize loaded normals
    for (size_t i = 0; i + 2 < mesh->nrm.size(); i += 3) {
        float x = mesh->nrm[i], y = mesh->nrm[i + 1], z = mesh->nrm[i + 2];
        float len = std::sqrt(x * x + y * y + z * z);
        if (len > 1e-12f) {
            mesh->nrm[i] /= len; mesh->nrm[i + 1] /= len; mesh->nrm[i + 2] /= len;
        }
    }

    *handle = mesh;
    *n_verts = (int64_t)(mesh->pos.size() / 3);
    *n_faces = (int64_t)(mesh->faces.size() / 3);
    *has_normals = mesh->has_normals ? 1 : 0;
    *has_uvs = mesh->has_uvs ? 1 : 0;
    return 0;
}

void m3t_copy_mesh(void* handle, float* v, float* n, float* uv, int32_t* f) {
    auto* mesh = (Mesh*)handle;
    memcpy(v, mesh->pos.data(), mesh->pos.size() * sizeof(float));
    memcpy(n, mesh->nrm.data(), mesh->nrm.size() * sizeof(float));
    memcpy(uv, mesh->uv.data(), mesh->uv.size() * sizeof(float));
    memcpy(f, mesh->faces.data(), mesh->faces.size() * sizeof(int32_t));
}

void m3t_free_mesh(void* handle) { delete (Mesh*)handle; }

}  // extern "C"
