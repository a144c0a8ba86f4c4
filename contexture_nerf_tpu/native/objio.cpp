// Host-side native runtime: fast OBJ parsing + per-face UV atlas packing.
//
// Plays the role of the reference's native IO/preprocessing dependencies
// (kaolin's C++ OBJ importer, xatlas C++ unwrap — SURVEY.md §2.2). These run
// once at experiment init on the host; the TPU never sees this code. The
// Python fallbacks in models/mesh.py and models/textured_mesh.py produce
// identical output; this library is the fast path for large meshes.
//
// C ABI (ctypes): all buffers are caller-owned after the call via
// objio_free(). Triangulation is fan-based (matches kaolin's naive
// homogenizer).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

struct ObjMesh {
  float* vertices;     // [n_vertices * 3]
  int64_t n_vertices;
  int64_t* faces;      // [n_faces * 3]
  int64_t n_faces;
  float* uvs;          // [n_uvs * 2] (may be null)
  int64_t n_uvs;
  int64_t* face_uvs;   // [n_faces * 3] (may be null)
};

static const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') p++;
  return p;
}

int objio_load(const char* path, ObjMesh* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -2;
  }
  fclose(f);
  buf[size] = '\0';

  std::vector<float> verts, uvs;
  std::vector<int64_t> face_v, face_vt;
  std::vector<int64_t> poly_v, poly_vt;

  const char* p = buf.data();
  const char* end = buf.data() + size;
  while (p < end) {
    const char* line_end = strchr(p, '\n');
    if (!line_end) line_end = end;
    p = skip_ws(p);
    if (p[0] == 'v' && p[1] == ' ') {
      char* q;
      float x = strtof(p + 2, &q);
      float y = strtof(q, &q);
      float z = strtof(q, &q);
      verts.push_back(x);
      verts.push_back(y);
      verts.push_back(z);
    } else if (p[0] == 'v' && p[1] == 't' && p[2] == ' ') {
      char* q;
      float u = strtof(p + 3, &q);
      float v = strtof(q, &q);
      uvs.push_back(u);
      uvs.push_back(v);
    } else if (p[0] == 'f' && p[1] == ' ') {
      poly_v.clear();
      poly_vt.clear();
      const char* q = p + 2;
      while (q < line_end) {
        q = skip_ws(q);
        if (q >= line_end || *q == '\r' || *q == '\n') break;
        char* next;
        long vi = strtol(q, &next, 10);
        if (next == q) break;
        int64_t v_idx = vi > 0 ? vi - 1 : (int64_t)(verts.size() / 3) + vi;
        int64_t t_idx = -1;
        q = next;
        if (*q == '/') {
          q++;
          if (*q != '/' && isdigit((unsigned char)*q)) {
            long ti = strtol(q, &next, 10);
            t_idx = ti > 0 ? ti - 1 : (int64_t)(uvs.size() / 2) + ti;
            q = next;
          }
          if (*q == '/') {  // skip normal index
            q++;
            strtol(q, &next, 10);
            q = next;
          }
        }
        poly_v.push_back(v_idx);
        poly_vt.push_back(t_idx);
      }
      // fan triangulation
      for (size_t k = 1; k + 1 < poly_v.size(); k++) {
        face_v.push_back(poly_v[0]);
        face_v.push_back(poly_v[k]);
        face_v.push_back(poly_v[k + 1]);
        face_vt.push_back(poly_vt[0]);
        face_vt.push_back(poly_vt[k]);
        face_vt.push_back(poly_vt[k + 1]);
      }
    }
    p = line_end + 1;
  }

  out->n_vertices = verts.size() / 3;
  out->vertices = (float*)malloc(verts.size() * sizeof(float));
  memcpy(out->vertices, verts.data(), verts.size() * sizeof(float));
  out->n_faces = face_v.size() / 3;
  out->faces = (int64_t*)malloc(face_v.size() * sizeof(int64_t));
  memcpy(out->faces, face_v.data(), face_v.size() * sizeof(int64_t));
  out->n_uvs = uvs.size() / 2;
  if (out->n_uvs > 0) {
    out->uvs = (float*)malloc(uvs.size() * sizeof(float));
    memcpy(out->uvs, uvs.data(), uvs.size() * sizeof(float));
    out->face_uvs = (int64_t*)malloc(face_vt.size() * sizeof(int64_t));
    memcpy(out->face_uvs, face_vt.data(), face_vt.size() * sizeof(int64_t));
  } else {
    out->uvs = nullptr;
    out->face_uvs = nullptr;
  }
  return 0;
}

void objio_free(ObjMesh* m) {
  free(m->vertices);
  free(m->faces);
  free(m->uvs);
  free(m->face_uvs);
  memset(m, 0, sizeof(ObjMesh));
}

// Per-face UV atlas packing (xatlas-role fallback; same layout as the numpy
// implementation in models/textured_mesh.py::atlas_unwrap).
int objio_atlas_unwrap(int64_t n_faces, float* vt_out /* [3*n_faces*2] */,
                       int64_t* ft_out /* [n_faces*3] */) {
  int64_t cols = (int64_t)ceil(sqrt((double)n_faces));
  int64_t rows = (int64_t)ceil((double)n_faces / cols);
  float cw = 1.0f / cols, ch = 1.0f / rows;
  const float gut = 0.1f;
  for (int64_t i = 0; i < n_faces; i++) {
    float cx = (i % cols) * cw;
    float cy = (i / cols) * ch;
    float x0 = cx + gut * cw, y0 = cy + gut * ch;
    float x1 = cx + (1 - gut) * cw, y1 = cy + (1 - gut) * ch;
    float* v = vt_out + i * 6;
    v[0] = x0; v[1] = y0;
    v[2] = x1; v[3] = y0;
    v[4] = x0; v[5] = y1;
    ft_out[i * 3 + 0] = i * 3 + 0;
    ft_out[i * 3 + 1] = i * 3 + 1;
    ft_out[i * 3 + 2] = i * 3 + 2;
  }
  return 0;
}

}  // extern "C"
