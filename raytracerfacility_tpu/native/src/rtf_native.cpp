// Native host runtime for raytracerfacility_tpu.
//
// The reference's host runtime is C++ (scene sync, GAS/SBT packing,
// CompressedBTF text-database parsing — ref RayTracer.cu:1835-2055,
// CompressedBTF.cpp:7-56); these are their TPU-framework equivalents: the
// CPU-side hot paths that feed device buffers. Exposed as a plain C ABI and
// bound from Python with ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -fPIC -shared (driven by native/build.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// Fast whitespace-separated numeric file parser (BTF text databases).
// Replaces ParseFloatData/ParseIntData (ref CompressedBTF.cpp:7-56): the
// UBO databases are tens of MB of ASCII floats; strtof in a tight loop is
// ~20x faster than Python tokenization.
//
// Returns number of values parsed into out (caller allocates capacity), or
// -1 on open failure. First 4 values of any array file are the
// "rows cols min max" header; the caller slices.
// ---------------------------------------------------------------------------
long long rtf_parse_doubles(const char* path, double* out, long long capacity) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    fseek(fp, 0, SEEK_END);
    long size = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    char* buf = (char*)malloc(size + 1);
    if (!buf) { fclose(fp); return -1; }
    size_t got = fread(buf, 1, size, fp);
    fclose(fp);
    buf[got] = '\0';

    long long count = 0;
    char* p = buf;
    char* endp;
    while (count < capacity) {
        double v = strtod(p, &endp);
        if (endp == p) {
            // skip a non-numeric char (shouldn't happen in valid files)
            if (*p == '\0') break;
            ++p;
            continue;
        }
        out[count++] = v;
        p = endp;
    }
    free(buf);
    return count;
}

// Header-only peek: reads the first two values (rows, cols).
int rtf_parse_header(const char* path, long long* rows, long long* cols) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return -1;
    char line[256];
    if (!fgets(line, sizeof(line), fp)) { fclose(fp); return -1; }
    fclose(fp);
    double r, c;
    if (sscanf(line, "%lf %lf", &r, &c) != 2) return -1;
    *rows = (long long)r;
    *cols = (long long)c;
    return 0;
}

// ---------------------------------------------------------------------------
// Triangle-corner bake: one fused pass producing the flat SoA buffers the
// compiled scene needs (replaces the SBT/vertex-prep packing,
// ref RayTracer.cu:1148-1249 + BuildSBT). Applies the 4x4 instance
// transform to positions (w=1) and normals/tangents (w=0, plain matrix —
// the reference's convention, RayDataDefinations.hpp:375).
//
// Inputs are the mesh SoA; outputs are caller-allocated.
// ---------------------------------------------------------------------------
void rtf_pack_corners(
    const float* positions,   // (N, 3)
    const float* normals,     // (N, 3)
    const float* tangents,    // (N, 3)
    const float* colors,      // (N, 4)
    const float* uvs,         // (N, 2)
    const float* data,        // (N, 4)
    const int32_t* tris,      // (T, 3)
    int64_t num_tris,
    const float* transform,   // (4, 4) row-major
    float* out_v0,            // (T, 3)
    float* out_e1,            // (T, 3)
    float* out_e2,            // (T, 3)
    float* out_normal,        // (T, 3, 3)
    float* out_tangent,       // (T, 3, 3)
    float* out_texcoord,      // (T, 3, 2)
    float* out_color,         // (T, 3, 4)
    float* out_data)          // (T, 3, 4)
{
    const float* m = transform;
    auto xform_point = [m](const float* p, float* o) {
        o[0] = m[0] * p[0] + m[1] * p[1] + m[2] * p[2] + m[3];
        o[1] = m[4] * p[0] + m[5] * p[1] + m[6] * p[2] + m[7];
        o[2] = m[8] * p[0] + m[9] * p[1] + m[10] * p[2] + m[11];
    };
    auto xform_dir = [m](const float* p, float* o) {
        o[0] = m[0] * p[0] + m[1] * p[1] + m[2] * p[2];
        o[1] = m[4] * p[0] + m[5] * p[1] + m[6] * p[2];
        o[2] = m[8] * p[0] + m[9] * p[1] + m[10] * p[2];
    };

    for (int64_t t = 0; t < num_tris; ++t) {
        const int32_t ia = tris[t * 3 + 0];
        const int32_t ib = tris[t * 3 + 1];
        const int32_t ic = tris[t * 3 + 2];
        float pa[3], pb[3], pc[3];
        xform_point(positions + ia * 3, pa);
        xform_point(positions + ib * 3, pb);
        xform_point(positions + ic * 3, pc);
        for (int k = 0; k < 3; ++k) {
            out_v0[t * 3 + k] = pa[k];
            out_e1[t * 3 + k] = pb[k] - pa[k];
            out_e2[t * 3 + k] = pc[k] - pa[k];
        }
        const int32_t idx[3] = {ia, ib, ic};
        for (int c = 0; c < 3; ++c) {
            xform_dir(normals + idx[c] * 3, out_normal + (t * 3 + c) * 3);
            xform_dir(tangents + idx[c] * 3, out_tangent + (t * 3 + c) * 3);
            memcpy(out_texcoord + (t * 3 + c) * 2, uvs + idx[c] * 2,
                   2 * sizeof(float));
            memcpy(out_color + (t * 3 + c) * 4, colors + idx[c] * 4,
                   4 * sizeof(float));
            memcpy(out_data + (t * 3 + c) * 4, data + idx[c] * 4,
                   4 * sizeof(float));
        }
    }
}

// ---------------------------------------------------------------------------
// Area-weighted vertex normals (procedural mesh support; the numpy add.at
// scatter is the slow path for large meshes).
// ---------------------------------------------------------------------------
void rtf_compute_vertex_normals(
    const float* positions, int64_t num_vertices,
    const int32_t* tris, int64_t num_tris,
    float* out_normals)
{
    memset(out_normals, 0, num_vertices * 3 * sizeof(float));
    for (int64_t t = 0; t < num_tris; ++t) {
        const int32_t a = tris[t * 3], b = tris[t * 3 + 1], c = tris[t * 3 + 2];
        const float* pa = positions + a * 3;
        const float* pb = positions + b * 3;
        const float* pc = positions + c * 3;
        float e1[3] = {pb[0] - pa[0], pb[1] - pa[1], pb[2] - pa[2]};
        float e2[3] = {pc[0] - pa[0], pc[1] - pa[1], pc[2] - pa[2]};
        float n[3] = {
            e1[1] * e2[2] - e1[2] * e2[1],
            e1[2] * e2[0] - e1[0] * e2[2],
            e1[0] * e2[1] - e1[1] * e2[0],
        };
        for (int v = 0; v < 3; ++v) {
            const int32_t i = tris[t * 3 + v];
            out_normals[i * 3 + 0] += n[0];
            out_normals[i * 3 + 1] += n[1];
            out_normals[i * 3 + 2] += n[2];
        }
    }
    for (int64_t i = 0; i < num_vertices; ++i) {
        float* n = out_normals + i * 3;
        float len = sqrtf(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
        if (len > 1e-12f) {
            n[0] /= len; n[1] /= len; n[2] /= len;
        }
    }
}

// ---------------------------------------------------------------------------
// 8-bone linear blend skinning (ref CopySkinnedVerticesKernel,
// RayTracer.cu:1194-1249) for animated scenes where the bake runs per frame
// on the host.
// ---------------------------------------------------------------------------
void rtf_skin_vertices(
    const float* positions,     // (N, 3)
    const float* normals,       // (N, 3)
    const float* tangents,      // (N, 3)
    const int32_t* bone_ids,    // (N, 8)
    const float* bone_weights,  // (N, 8)
    const float* bone_matrices, // (B, 4, 4) row-major
    int64_t num_vertices,
    float* out_positions,
    float* out_normals,
    float* out_tangents)
{
    for (int64_t i = 0; i < num_vertices; ++i) {
        float m[12] = {0};
        for (int k = 0; k < 8; ++k) {
            const float w = bone_weights[i * 8 + k];
            if (w == 0.0f) continue;
            int32_t b = bone_ids[i * 8 + k];
            if (b < 0) b = 0;
            const float* bm = bone_matrices + b * 16;
            for (int r = 0; r < 3; ++r)
                for (int c = 0; c < 4; ++c)
                    m[r * 4 + c] += w * bm[r * 4 + c];
        }
        const float* p = positions + i * 3;
        const float* n = normals + i * 3;
        const float* tg = tangents + i * 3;
        for (int r = 0; r < 3; ++r) {
            out_positions[i * 3 + r] =
                m[r * 4] * p[0] + m[r * 4 + 1] * p[1] + m[r * 4 + 2] * p[2]
                + m[r * 4 + 3];
            out_normals[i * 3 + r] =
                m[r * 4] * n[0] + m[r * 4 + 1] * n[1] + m[r * 4 + 2] * n[2];
            out_tangents[i * 3 + r] =
                m[r * 4] * tg[0] + m[r * 4 + 1] * tg[1] + m[r * 4 + 2] * tg[2];
        }
    }
}

}  // extern "C"
