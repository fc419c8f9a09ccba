// Mesh boolean operations via BSP solid clipping (csg.js algorithm).
//
// TPU-native replacement for the reference's OCCT boolean commands
// (bcut/bfuse/bcommon/bop — driven by data/scripts/*.tcl). The modeling
// layer works on watertight triangle meshes with per-triangle face ids,
// so booleans are mesh-level: build a BSP tree per operand, clip each
// operand's polygons against the other solid, merge. Face ids survive
// clipping, keeping `explode <r> f` meaningful after a boolean.
//
// ABI (ctypes): flat float64/int32 arrays in, malloc'd arrays out,
// crt_csg_free releases. Operation codes: 0=union 1=subtract 2=intersect.
#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <memory>

namespace {

constexpr double EPS = 1e-7;

struct Vec {
  double x, y, z;
  Vec operator+(const Vec& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec operator-(const Vec& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec cross(const Vec& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double len() const { return std::sqrt(dot(*this)); }
};

struct Plane {
  Vec n;
  double w;
  bool ok = false;
  static Plane from_points(const Vec& a, const Vec& b, const Vec& c) {
    Plane p;
    Vec n = (b - a).cross(c - a);
    double l = n.len();
    if (l < 1e-12) return p;
    p.n = n * (1.0 / l);
    p.w = p.n.dot(a);
    p.ok = true;
    return p;
  }
  void flip() { n = n * -1.0; w = -w; }
};

struct Polygon {
  std::vector<Vec> v;
  Plane plane;
  int32_t face_id;
  int32_t owner;  // 0 = from A, 1 = from B (face id namespaces)
  void flip() {
    std::reverse(v.begin(), v.end());
    plane.flip();
  }
};

enum { COPLANAR = 0, FRONT = 1, BACK = 2, SPANNING = 3 };

void split_polygon(const Plane& pl, const Polygon& poly,
                   std::vector<Polygon>& cofront,
                   std::vector<Polygon>& coback,
                   std::vector<Polygon>& front,
                   std::vector<Polygon>& back) {
  int poly_type = 0;
  std::vector<int> types(poly.v.size());
  for (size_t i = 0; i < poly.v.size(); ++i) {
    double t = pl.n.dot(poly.v[i]) - pl.w;
    int ty = (t < -EPS) ? BACK : (t > EPS) ? FRONT : COPLANAR;
    poly_type |= ty;
    types[i] = ty;
  }
  switch (poly_type) {
    case COPLANAR:
      (pl.n.dot(poly.plane.n) > 0 ? cofront : coback).push_back(poly);
      break;
    case FRONT:
      front.push_back(poly);
      break;
    case BACK:
      back.push_back(poly);
      break;
    case SPANNING: {
      Polygon f, b;
      f.plane = b.plane = poly.plane;
      f.face_id = b.face_id = poly.face_id;
      f.owner = b.owner = poly.owner;
      size_t n = poly.v.size();
      for (size_t i = 0; i < n; ++i) {
        size_t j = (i + 1) % n;
        int ti = types[i], tj = types[j];
        const Vec &vi = poly.v[i], &vj = poly.v[j];
        if (ti != BACK) f.v.push_back(vi);
        if (ti != FRONT) b.v.push_back(vi);
        if ((ti | tj) == SPANNING) {
          double t = (pl.w - pl.n.dot(vi)) / pl.n.dot(vj - vi);
          Vec v = vi + (vj - vi) * t;
          f.v.push_back(v);
          b.v.push_back(v);
        }
      }
      if (f.v.size() >= 3) front.push_back(std::move(f));
      if (b.v.size() >= 3) back.push_back(std::move(b));
      break;
    }
  }
}

struct Node {
  Plane plane;
  std::unique_ptr<Node> front, back;
  std::vector<Polygon> polygons;

  void invert() {
    for (auto& p : polygons) p.flip();
    plane.flip();
    if (front) front->invert();
    if (back) back->invert();
    std::swap(front, back);
  }

  std::vector<Polygon> clip_polygons(std::vector<Polygon> list) const {
    if (!plane.ok) return list;
    std::vector<Polygon> f, b;
    for (auto& p : list) {
      split_polygon(plane, p, f, b, f, b);
    }
    if (front) f = front->clip_polygons(std::move(f));
    if (back) b = back->clip_polygons(std::move(b));
    else b.clear();
    f.insert(f.end(), b.begin(), b.end());
    return f;
  }

  void clip_to(const Node& bsp) {
    polygons = bsp.clip_polygons(std::move(polygons));
    if (front) front->clip_to(bsp);
    if (back) back->clip_to(bsp);
  }

  void all_polygons(std::vector<Polygon>& out) const {
    out.insert(out.end(), polygons.begin(), polygons.end());
    if (front) front->all_polygons(out);
    if (back) back->all_polygons(out);
  }

  void build(std::vector<Polygon> list) {
    if (list.empty()) return;
    if (!plane.ok) {
      // pick a splitting plane with some balance heuristics: sample a
      // few candidates, choose fewest spans (cheap median-ish choice
      // keeps depth sane on CAD meshes with many coplanar triangles)
      size_t best = 0;
      long best_cost = -1;
      size_t step = list.size() / 8 + 1;
      for (size_t c = 0; c < list.size(); c += step) {
        if (!list[c].plane.ok) continue;
        long spans = 0, fr = 0, bk = 0;
        for (size_t i = 0; i < list.size(); i += step) {
          int type = 0;
          for (const auto& v : list[i].v) {
            double t = list[c].plane.n.dot(v) - list[c].plane.w;
            type |= (t < -EPS) ? BACK : (t > EPS) ? FRONT : COPLANAR;
          }
          if (type == SPANNING) ++spans;
          else if (type == FRONT) ++fr;
          else if (type == BACK) ++bk;
        }
        long cost = spans * 4 + std::labs(fr - bk);
        if (best_cost < 0 || cost < best_cost) {
          best_cost = cost;
          best = c;
        }
      }
      plane = list[best].plane;
      if (!plane.ok) {
        for (auto& p : list)
          if (p.plane.ok) { plane = p.plane; break; }
        if (!plane.ok) return;
      }
    }
    std::vector<Polygon> f, b;
    for (auto& p : list) {
      split_polygon(plane, p, polygons, polygons, f, b);
    }
    if (!f.empty()) {
      if (!front) front = std::make_unique<Node>();
      front->build(std::move(f));
    }
    if (!b.empty()) {
      if (!back) back = std::make_unique<Node>();
      back->build(std::move(b));
    }
  }
};

std::vector<Polygon> mesh_to_polys(const double* verts, const int32_t* tris,
                                   int64_t n_tris, const int32_t* face_id,
                                   int owner) {
  std::vector<Polygon> out;
  out.reserve(n_tris);
  for (int64_t t = 0; t < n_tris; ++t) {
    Polygon p;
    for (int k = 0; k < 3; ++k) {
      const double* v = verts + 3 * tris[3 * t + k];
      p.v.push_back({v[0], v[1], v[2]});
    }
    p.plane = Plane::from_points(p.v[0], p.v[1], p.v[2]);
    if (!p.plane.ok) continue;  // degenerate input triangle
    p.face_id = face_id ? face_id[t] : 0;
    p.owner = owner;
    out.push_back(std::move(p));
  }
  return out;
}

struct Result {
  std::vector<double> verts;
  std::vector<int32_t> tris;
  std::vector<int32_t> face_id;
  std::vector<int32_t> owner;
};

void polys_to_mesh(const std::vector<Polygon>& polys, Result& r) {
  for (const auto& p : polys) {
    if (p.v.size() < 3) continue;
    int32_t base = (int32_t)(r.verts.size() / 3);
    for (const auto& v : p.v) {
      r.verts.push_back(v.x);
      r.verts.push_back(v.y);
      r.verts.push_back(v.z);
    }
    for (size_t k = 1; k + 1 < p.v.size(); ++k) {
      r.tris.push_back(base);
      r.tris.push_back(base + (int32_t)k);
      r.tris.push_back(base + (int32_t)k + 1);
      r.face_id.push_back(p.face_id);
      r.owner.push_back(p.owner);
    }
  }
}

}  // namespace

extern "C" {

// op: 0=union(A|B) 1=subtract(A-B) 2=intersect(A&B)
// Outputs malloc'd; caller frees with crt_csg_free. Returns #tris or -1.
int64_t crt_csg(int32_t op,
                const double* va, int64_t nva, const int32_t* ta,
                int64_t nta, const int32_t* fa,
                const double* vb, int64_t nvb, const int32_t* tb,
                int64_t ntb, const int32_t* fb,
                double** out_verts, int64_t* out_nv,
                int32_t** out_tris, int32_t** out_face,
                int32_t** out_owner) {
  (void)nva; (void)nvb;
  auto pa = mesh_to_polys(va, ta, nta, fa, 0);
  auto pb = mesh_to_polys(vb, tb, ntb, fb, 1);
  if (pa.empty() || pb.empty()) return -1;

  Node a, b;
  if (op == 1) {
    // A - B  ==  ~(~A | B)
    a.build(std::move(pa));
    b.build(std::move(pb));
    a.invert();
    a.clip_to(b);
    b.clip_to(a);
    b.invert();
    b.clip_to(a);
    b.invert();
    std::vector<Polygon> bp;
    b.all_polygons(bp);
    a.build(std::move(bp));
    a.invert();
  } else if (op == 2) {
    // A & B  ==  ~(~A | ~B)
    a.build(std::move(pa));
    b.build(std::move(pb));
    a.invert();
    b.clip_to(a);
    b.invert();
    a.clip_to(b);
    b.clip_to(a);
    std::vector<Polygon> bp;
    b.all_polygons(bp);
    a.build(std::move(bp));
    a.invert();
  } else {
    a.build(std::move(pa));
    b.build(std::move(pb));
    a.clip_to(b);
    b.clip_to(a);
    b.invert();
    b.clip_to(a);
    b.invert();
    std::vector<Polygon> bp;
    b.all_polygons(bp);
    a.build(std::move(bp));
  }

  std::vector<Polygon> all;
  a.all_polygons(all);
  Result r;
  polys_to_mesh(all, r);

  *out_nv = (int64_t)(r.verts.size() / 3);
  *out_verts = (double*)std::malloc(r.verts.size() * sizeof(double));
  std::memcpy(*out_verts, r.verts.data(), r.verts.size() * sizeof(double));
  int64_t n_tris = (int64_t)(r.tris.size() / 3);
  *out_tris = (int32_t*)std::malloc(r.tris.size() * sizeof(int32_t));
  std::memcpy(*out_tris, r.tris.data(), r.tris.size() * sizeof(int32_t));
  *out_face = (int32_t*)std::malloc(r.face_id.size() * sizeof(int32_t));
  std::memcpy(*out_face, r.face_id.data(),
              r.face_id.size() * sizeof(int32_t));
  *out_owner = (int32_t*)std::malloc(r.owner.size() * sizeof(int32_t));
  std::memcpy(*out_owner, r.owner.data(), r.owner.size() * sizeof(int32_t));
  return n_tris;
}

void crt_csg_free(void* p) { std::free(p); }

}  // extern "C"
