// Fast OBJ vertex/face parser — native replacement for the reference's
// tinyobjloader dependency (used for dataset sanity/alignment,
// monoport/lib/dataset/ppl_dynamic.py:21-35).
//
// Exposed as a plain C ABI consumed via ctypes (monoport_tpu/utils/
// objloader_native.py). Parses 'v' and 'f' records (fan-triangulated
// polygons, 1-based and negative indices) with a single pass over a
// memory buffer; ~20-40x faster than the Python parser on large scans.
//
// Build: g++ -O3 -shared -fPIC -o libobjloader.so objloader.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Mesh {
    std::vector<float> verts;     // flat xyz
    std::vector<int64_t> faces;   // flat triangle indices
};

// fast float parse: strtof handles all obj float formats
inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

void parse(const char* buf, size_t len, Mesh* mesh) {
    const char* p = buf;
    const char* end = buf + len;
    std::vector<int64_t> poly;
    poly.reserve(8);
    while (p < end) {
        p = skip_ws(p, end);
        if (p + 1 < end && p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            char* q = nullptr;
            float x = strtof(p + 2, &q);
            float y = strtof(q, &q);
            float z = strtof(q, &q);
            mesh->verts.push_back(x);
            mesh->verts.push_back(y);
            mesh->verts.push_back(z);
        } else if (p < end && p[0] == 'f') {
            poly.clear();
            const char* q = p + 1;
            while (q < end && *q != '\n') {
                q = skip_ws(q, end);
                if (q >= end || *q == '\n' || *q == '#') break;
                char* r = nullptr;
                long idx = strtol(q, &r, 10);
                if (r == q) break;
                // skip /vt/vn suffixes
                while (r < end && *r != ' ' && *r != '\t' && *r != '\n'
                       && *r != '\r') ++r;
                int64_t n_verts = (int64_t)(mesh->verts.size() / 3);
                int64_t vi = idx > 0 ? idx - 1 : n_verts + idx;
                poly.push_back(vi);
                q = r;
            }
            // fan triangulation (quads and beyond)
            for (size_t k = 2; k < poly.size(); ++k) {
                mesh->faces.push_back(poly[0]);
                mesh->faces.push_back(poly[k - 1]);
                mesh->faces.push_back(poly[k]);
            }
        }
        p = next_line(p, end);
    }
}

}  // namespace

extern "C" {

// Parse file -> opaque handle; returns nullptr on failure.
void* obj_parse_file(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf((size_t)size);
    size_t rd = fread(buf.data(), 1, (size_t)size, f);
    fclose(f);
    if (rd != (size_t)size) return nullptr;
    Mesh* mesh = new Mesh();
    parse(buf.data(), buf.size(), mesh);
    return mesh;
}

int64_t obj_num_verts(void* handle) {
    return (int64_t)(static_cast<Mesh*>(handle)->verts.size() / 3);
}

int64_t obj_num_faces(void* handle) {
    return (int64_t)(static_cast<Mesh*>(handle)->faces.size() / 3);
}

const float* obj_verts_ptr(void* handle) {
    return static_cast<Mesh*>(handle)->verts.data();
}

const int64_t* obj_faces_ptr(void* handle) {
    return static_cast<Mesh*>(handle)->faces.data();
}

void obj_free(void* handle) {
    delete static_cast<Mesh*>(handle);
}

}  // extern "C"
