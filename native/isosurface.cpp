// Native isosurface extraction for d3fields_tpu.
//
// Replaces the reference's external PyMCubes C++ dependency
// (reference fusion.py:16,1323-1324: mcubes.smooth + mcubes.marching_cubes).
// The TPU produces the distance volume; this library turns it into a mesh on
// the host. Algorithm: marching tetrahedra (6-tet decomposition around the
// cube main diagonal) — small closed-form case table, watertight output,
// vertices deduplicated per grid edge so downstream field evaluation per
// vertex (reference vis_repr.py:100-103) touches each vertex once.
//
// Exposed C ABI (consumed via ctypes from d3fields_tpu.mesh._native):
//   iso_marching_tetrahedra(vol, n0, n1, n2, iso, &verts, &tris, &nv, &nt)
//   iso_free(ptr)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

// Cube corner offsets, bit0=x, bit1=y, bit2=z reinterpreted so that corners
// 0..7 wind around the cube with main diagonal 0-6.
static const int CORNER_OFF[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// Six tetrahedra sharing the 0-6 diagonal; every face interior to the cube is
// shared by exactly two tets, so the extracted surface is watertight.
static const int TETS[6][4] = {
    {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
    {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6},
};

struct MeshBuilder {
  std::vector<float> verts;
  std::vector<int32_t> tris;
  std::unordered_map<uint64_t, int32_t> edge_vertex;

  // Global node ids are flat indices into the (n0, n1, n2) grid; an
  // interpolated vertex is keyed by its edge endpoints. Callers pass the
  // endpoints already canonicalized (a < b) so both tets sharing an edge
  // produce the same key and the same interpolated position.
  int32_t vertex_on_edge(uint64_t a, uint64_t b, const V3& pa, const V3& pb,
                         float va, float vb, float iso) {
    uint64_t key = (a << 32) ^ b;
    auto it = edge_vertex.find(key);
    if (it != edge_vertex.end()) return it->second;
    float denom = vb - va;
    float t = (denom == 0.0f) ? 0.5f : (iso - va) / denom;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    V3 p{pa.x + t * (pb.x - pa.x), pa.y + t * (pb.y - pa.y),
         pa.z + t * (pb.z - pa.z)};
    int32_t id = static_cast<int32_t>(verts.size() / 3);
    verts.push_back(p.x);
    verts.push_back(p.y);
    verts.push_back(p.z);
    edge_vertex.emplace(key, id);
    return id;
  }

  void triangle(int32_t a, int32_t b, int32_t c) {
    if (a == b || b == c || a == c) return;  // degenerate (iso hits a node)
    tris.push_back(a);
    tris.push_back(b);
    tris.push_back(c);
  }
};

}  // namespace

extern "C" {

int iso_marching_tetrahedra(const float* vol, int n0, int n1, int n2,
                            float iso, float** out_verts, int32_t** out_tris,
                            int* n_verts, int* n_tris) {
  if (!vol || n0 < 2 || n1 < 2 || n2 < 2) return -1;
  MeshBuilder mb;
  const int64_t s0 = static_cast<int64_t>(n1) * n2;
  const int64_t s1 = n2;

  auto node_id = [&](int i, int j, int k) -> uint64_t {
    return static_cast<uint64_t>(i) * s0 + static_cast<uint64_t>(j) * s1 + k;
  };

  // Per-tet corner scratch.
  uint64_t nid[8];
  V3 pos[8];
  float val[8];

  for (int i = 0; i + 1 < n0; ++i) {
    for (int j = 0; j + 1 < n1; ++j) {
      for (int k = 0; k + 1 < n2; ++k) {
        for (int c = 0; c < 8; ++c) {
          int ci = i + CORNER_OFF[c][0];
          int cj = j + CORNER_OFF[c][1];
          int ck = k + CORNER_OFF[c][2];
          nid[c] = node_id(ci, cj, ck);
          pos[c] = V3{static_cast<float>(ci), static_cast<float>(cj),
                      static_cast<float>(ck)};
          val[c] = vol[nid[c]];
        }

        for (int t = 0; t < 6; ++t) {
          const int* T = TETS[t];
          int code = 0;
          for (int c = 0; c < 4; ++c)
            if (val[T[c]] < iso) code |= 1 << c;
          if (code == 0 || code == 15) continue;

          auto ev = [&](int a, int b) {
            int ca = T[a], cb = T[b];
            uint64_t ia = nid[ca], ib = nid[cb];
            // Canonicalize endpoint order so both tets sharing the edge agree.
            if (ia <= ib)
              return mb.vertex_on_edge(ia, ib, pos[ca], pos[cb], val[ca],
                                       val[cb], iso);
            return mb.vertex_on_edge(ib, ia, pos[cb], pos[ca], val[cb],
                                     val[ca], iso);
          };

          switch (code) {
            // one corner inside
            case 1:  mb.triangle(ev(0, 1), ev(0, 2), ev(0, 3)); break;
            case 2:  mb.triangle(ev(1, 0), ev(1, 3), ev(1, 2)); break;
            case 4:  mb.triangle(ev(2, 0), ev(2, 1), ev(2, 3)); break;
            case 8:  mb.triangle(ev(3, 0), ev(3, 2), ev(3, 1)); break;
            // one corner outside (mirror orientation)
            case 14: mb.triangle(ev(0, 1), ev(0, 3), ev(0, 2)); break;
            case 13: mb.triangle(ev(1, 0), ev(1, 2), ev(1, 3)); break;
            case 11: mb.triangle(ev(2, 0), ev(2, 3), ev(2, 1)); break;
            case 7:  mb.triangle(ev(3, 0), ev(3, 1), ev(3, 2)); break;
            // two-two splits: quad as two triangles
            case 3: {
              int a = ev(0, 2), b = ev(0, 3), c = ev(1, 3), d = ev(1, 2);
              mb.triangle(a, b, c);
              mb.triangle(a, c, d);
              break;
            }
            case 12: {
              int a = ev(0, 2), b = ev(0, 3), c = ev(1, 3), d = ev(1, 2);
              mb.triangle(a, c, b);
              mb.triangle(a, d, c);
              break;
            }
            case 5: {
              int a = ev(0, 1), b = ev(0, 3), c = ev(2, 3), d = ev(2, 1);
              mb.triangle(a, c, b);
              mb.triangle(a, d, c);
              break;
            }
            case 10: {
              int a = ev(0, 1), b = ev(0, 3), c = ev(2, 3), d = ev(2, 1);
              mb.triangle(a, b, c);
              mb.triangle(a, c, d);
              break;
            }
            case 6: {
              int a = ev(1, 0), b = ev(1, 3), c = ev(2, 3), d = ev(2, 0);
              mb.triangle(a, b, c);
              mb.triangle(a, c, d);
              break;
            }
            case 9: {
              int a = ev(1, 0), b = ev(1, 3), c = ev(2, 3), d = ev(2, 0);
              mb.triangle(a, c, b);
              mb.triangle(a, d, c);
              break;
            }
          }
        }
      }
    }
  }

  *n_verts = static_cast<int>(mb.verts.size() / 3);
  *n_tris = static_cast<int>(mb.tris.size() / 3);
  float* vbuf = static_cast<float*>(std::malloc(mb.verts.size() * sizeof(float)));
  int32_t* tbuf =
      static_cast<int32_t*>(std::malloc(mb.tris.size() * sizeof(int32_t)));
  if ((!vbuf && !mb.verts.empty()) || (!tbuf && !mb.tris.empty())) {
    std::free(vbuf);
    std::free(tbuf);
    return -2;
  }
  if (!mb.verts.empty())
    std::memcpy(vbuf, mb.verts.data(), mb.verts.size() * sizeof(float));
  if (!mb.tris.empty())
    std::memcpy(tbuf, mb.tris.data(), mb.tris.size() * sizeof(int32_t));
  *out_verts = vbuf;
  *out_tris = tbuf;
  return 0;
}

void iso_free(void* p) { std::free(p); }

}  // extern "C"
