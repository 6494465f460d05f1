// Native host topology engine for ch_shrinkwrap_tpu.
//
// C++ counterpart of the reference's native mesh layer (PYME
// triangle_mesh_utils.c + the Cython edit kernels in
// /root/reference/ch_shrinkwrap/_membrane_mesh.pyx /
// _skeleton_mesh.pyx), re-designed for the compact-(V,F) architecture:
// the device pipeline only ever sees padded SoA arrays, so this engine
// takes (V,F), builds halfedge connectivity internally, performs
// sequential guarded remeshing (split / collapse / flip / relax — a
// serial greedy pass has no independent-set sparsity limits, unlike
// the vectorized numpy fallback), and emits a compacted (V,F) pair
// plus the neighbor tables the curvature/solver kernels consume.
//
// Plain C ABI for ctypes binding (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <chrono>
#include <vector>
#include <algorithm>
#include <unordered_map>
#include <array>

namespace {

struct Vec3 {
    float x, y, z;
    Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
    Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
    Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
    float dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
    Vec3 cross(const Vec3& o) const {
        return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
    }
    float norm2() const { return dot(*this); }
    float norm() const { return std::sqrt(norm2()); }
};

// Edit-mesh: adjacency kept as per-vertex vectors of neighbor vertices
// and incident faces; faces as index triples with a live flag.
struct EditMesh {
    std::vector<Vec3> pos;
    std::vector<std::array<int32_t, 3>> faces;
    std::vector<uint8_t> face_live;
    std::vector<uint8_t> vert_live;
    std::vector<std::vector<int32_t>> vfaces;   // faces incident to vertex
    // epoch-stamped vertex marks: O(deg) one-ring dedup / set
    // intersection instead of the O(deg^2) std::find scans that
    // dominated the collapse pass (60% of a growth remesh)
    mutable std::vector<uint32_t> mark_;
    mutable uint32_t epoch_ = 0;

    inline uint32_t new_epoch() const {
        if (mark_.size() < pos.size())
            mark_.resize(pos.size() * 2 + 64, 0);
        if (++epoch_ == 0) {            // wraparound: clear and restart
            std::fill(mark_.begin(), mark_.end(), 0u);
            epoch_ = 1;
        }
        return epoch_;
    }

    void build(const float* verts, int nv, const int32_t* f, int nf) {
        pos.resize(nv);
        std::memcpy(pos.data(), verts, sizeof(float) * 3 * nv);
        faces.resize(nf);
        face_live.assign(nf, 1);
        vert_live.assign(nv, 1);
        vfaces.assign(nv, {});
        for (int i = 0; i < nf; ++i) {
            faces[i] = {f[3 * i], f[3 * i + 1], f[3 * i + 2]};
            for (int k = 0; k < 3; ++k) vfaces[faces[i][k]].push_back(i);
        }
    }

    inline int valence(int v) const { return (int)vfaces[v].size(); }

    // collect one-ring vertices of v into out; returns count
    int ring(int v, std::vector<int32_t>& out) const {
        out.clear();
        uint32_t e = new_epoch();
        mark_[v] = e;                    // excludes v itself
        for (int fi : vfaces[v]) {
            if (!face_live[fi]) continue;
            for (int k = 0; k < 3; ++k) {
                int u = faces[fi][k];
                if (mark_[u] != e) {
                    mark_[u] = e;
                    out.push_back(u);
                }
            }
        }
        return (int)out.size();
    }

    // does any live face contain both a and b?  (early-exit variant
    // of edge_faces for existence-only callers — the flip pass's c-d
    // test walks the full incidence list otherwise)
    bool has_edge(int a, int b) const {
        for (int fi : vfaces[a]) {
            if (!face_live[fi]) continue;
            const auto& F = faces[fi];
            if (F[0] == b || F[1] == b || F[2] == b) return true;
        }
        return false;
    }

    // number of live faces containing both a and b, filling them
    int edge_faces(int a, int b, int out[2]) const {
        int n = 0;
        for (int fi : vfaces[a]) {
            if (!face_live[fi]) continue;
            const auto& F = faces[fi];
            if (F[0] == b || F[1] == b || F[2] == b) {
                if (n < 2) out[n] = fi;
                ++n;
            }
        }
        return n;
    }

    // area-weighted (unnormalized) vertex normal over live faces
    Vec3 vnormal(int v) const {
        Vec3 n{0, 0, 0};
        for (int fi : vfaces[v])
            if (face_live[fi]) n = n + face_normal(fi);
        return n;
    }

    Vec3 face_normal(int fi) const {
        const auto& F = faces[fi];
        return (pos[F[1]] - pos[F[0]]).cross(pos[F[2]] - pos[F[0]]);
    }

    void replace_vertex(int fi, int from, int to) {
        for (int k = 0; k < 3; ++k)
            if (faces[fi][k] == from) faces[fi][k] = to;
    }

    bool face_degenerate(int fi) const {
        const auto& F = faces[fi];
        return F[0] == F[1] || F[1] == F[2] || F[0] == F[2];
    }

    void kill_face(int fi) {
        face_live[fi] = 0;
    }

    // Collapse edge (a, b): b merges into a at the midpoint.
    // Guards: both interior (exactly 2 shared faces), link condition
    // (|ring(a) & ring(b)| == 2), valence cap, fold-over normal test,
    // and (high2 > 0) no resulting edge longer than sqrt(high2) — the
    // Botsch-Kobbelt result guard; without it collapse re-creates
    // over-long edges that the next split pass re-splits, and the
    // split/collapse churn costs ~75% of a growth remesh (measured:
    // 350k splits + 340k collapses per pass with stable output).
    mutable long fail_ef = 0, fail_link = 0, fail_val = 0,
                 fail_high2 = 0, fail_fold = 0;
    bool collapse(int a, int b, int max_valence, std::vector<int32_t>& ra,
                  std::vector<int32_t>& rb, float high2 = -1.f,
                  const std::vector<int32_t>* ra_pre = nullptr) {
        // Guard REORDER, not a new guard: the Botsch-Kobbelt result
        // test rejects 96%+ of the growth remesh's attempts (measured
        // fail census: high2 156-182k vs link <500, fold <200 per
        // pass), and the caller already holds ring(a) — check it
        // BEFORE paying the edge_faces walk + ring(b) + link test.
        // Identical accept/reject set: the same condition is (re-)
        // checked below; no state is written before any reject.
        if (high2 > 0.f && ra_pre) {
            Vec3 mid_pre = (pos[a] + pos[b]) * 0.5f;
            for (int u : *ra_pre)
                if (u != b && (pos[u] - mid_pre).norm2() > high2) {
                    ++fail_high2;
                    return false;
                }
        }
        int ef[2];
        if (edge_faces(a, b, ef) != 2) { ++fail_ef; return false; }
        // ra_pre: caller-precomputed ring(a) — the greedy collapse
        // loop attempts every short neighbor of a fixed pivot, and
        // failed attempts leave ring(a) unchanged, so recomputing it
        // per attempt is pure waste
        if (ra_pre == nullptr) ring(a, ra);
        const std::vector<int32_t>& rra = ra_pre ? *ra_pre : ra;
        ring(b, rb);
        uint32_t e = new_epoch();
        for (int u : rb) mark_[u] = e;
        int common = 0;
        for (int u : rra) common += (mark_[u] == e);
        if (common != 2) { ++fail_link; return false; }
        if ((int)(rra.size() + rb.size()) - 4 > max_valence) { ++fail_val; return false; }

        Vec3 mid = (pos[a] + pos[b]) * 0.5f;
        if (high2 > 0.f) {
            for (int u : rra)
                if (u != b && (pos[u] - mid).norm2() > high2) { ++fail_high2; return false; }
            for (int u : rb)
                if (u != a && (pos[u] - mid).norm2() > high2) { ++fail_high2; return false; }
        }

        // fold-over guard: surviving faces of a and b must not flip
        Vec3 old_a = pos[a], old_b = pos[b];
        pos[a] = mid;
        pos[b] = mid;
        for (int pass = 0; pass < 2; ++pass) {
            int v = pass == 0 ? a : b;
            for (int fi : vfaces[v]) {
                if (!face_live[fi] || fi == ef[0] || fi == ef[1]) continue;
                const auto& F = faces[fi];
                // normal before (with old positions) vs after
                Vec3 p0 = pos[F[0]], p1 = pos[F[1]], p2 = pos[F[2]];
                Vec3 n_new = (p1 - p0).cross(p2 - p0);
                // recompute with original positions
                Vec3 q[3];
                for (int k = 0; k < 3; ++k) {
                    int u = F[k];
                    q[k] = (u == a) ? old_a : (u == b) ? old_b : pos[u];
                }
                Vec3 n_old = (q[1] - q[0]).cross(q[2] - q[0]);
                if (n_new.dot(n_old) <= 0.f) {
                    pos[a] = old_a;
                    pos[b] = old_b;
                    ++fail_fold;
                    return false;
                }
            }
        }

        // apply: faces of b -> a; shared faces die
        kill_face(ef[0]);
        kill_face(ef[1]);
        for (int fi : vfaces[b]) {
            if (!face_live[fi]) continue;
            replace_vertex(fi, b, a);
            if (face_degenerate(fi)) kill_face(fi);
            else vfaces[a].push_back(fi);
        }
        vfaces[b].clear();
        vert_live[b] = 0;
        // prune dead faces from a's list
        auto& fa = vfaces[a];
        fa.erase(std::remove_if(fa.begin(), fa.end(),
                                [&](int fi) { return !face_live[fi]; }),
                 fa.end());
        return true;
    }

    // Split edge (a, b) at midpoint; the 1-2 incident faces become
    // 2-4.  Returns false on the silent no-op (edge_faces outside
    // 1..2, e.g. a transient nonmanifold edge) — the split-scan
    // dirty-set must know, or the baseline's next-pass retry of the
    // still-long edge is skipped (measured: 25 such skips diverged a
    // coarsening remesh before this returned a value).
    bool split(int a, int b) {
        int ef[2];
        int n = edge_faces(a, b, ef);
        if (n < 1 || n > 2) return false;
        int m = (int)pos.size();
        pos.push_back((pos[a] + pos[b]) * 0.5f);
        vert_live.push_back(1);
        vfaces.push_back({});
        for (int e = 0; e < n; ++e) {
            int fi = ef[e];
            auto F = faces[fi];
            // find corner c (not a, not b) preserving winding
            // face (x, y, z); edge a-b appears as consecutive pair
            int ia = F[0] == a ? 0 : F[1] == a ? 1 : 2;
            // new faces: replace b with m in fi; add (m, b side) face
            // find index of b
            int ib = F[0] == b ? 0 : F[1] == b ? 1 : 2;
            (void)ia;
            // face1: fi with b -> m
            replace_vertex(fi, b, m);
            vfaces[m].push_back(fi);
            // face2: original with a -> m
            std::array<int32_t, 3> f2 = F;
            f2[ia] = m;
            (void)ib;
            int nf = (int)faces.size();
            faces.push_back(f2);
            face_live.push_back(1);
            vfaces[m].push_back(nf);
            for (int k = 0; k < 3; ++k)
                if (f2[k] != m) vfaces[f2[k]].push_back(nf);
            // b keeps face2 via the loop above; remove fi from b's list
            auto& fb = vfaces[b];
            fb.erase(std::remove(fb.begin(), fb.end(), fi), fb.end());
        }
        return true;
    }

    // Flip the edge (a, b) shared by exactly two faces if it improves
    // valence regularity and passes geometry guards.  ``val``
    // (optional): caller-maintained live-valence array — saves the 4
    // O(deg) vfaces walks per candidate that dominated converged flip
    // passes; updated in place when the flip lands (a/b lose one
    // incident face pair, c/d gain).
    bool flip(int a, int b, std::vector<int32_t>& scratch,
              std::vector<int32_t>* val = nullptr) {
        int ef[2];
        if (edge_faces(a, b, ef) != 2) return false;
        int f1 = ef[0], f2 = ef[1];
        int c = -1, d = -1;
        for (int k = 0; k < 3; ++k) {
            int u = faces[f1][k];
            if (u != a && u != b) c = u;
            int w = faces[f2][k];
            if (w != a && w != b) d = w;
        }
        if (c < 0 || d < 0 || c == d) return false;

        int va = val ? (*val)[a] : valence(a),
            vb = val ? (*val)[b] : valence(b),
            vc = val ? (*val)[c] : valence(c),
            vd = val ? (*val)[d] : valence(d);
        auto dev = [](int v) { return (v - 6) * (v - 6); };
        int before = dev(va) + dev(vb) + dev(vc) + dev(vd);
        int after = dev(va - 1) + dev(vb - 1) + dev(vc + 1) + dev(vd + 1);
        if (after >= before) return false;

        // c-d must not already be an edge (after the cheap valence
        // reject — this walks an incidence list)
        if (has_edge(c, d)) return false;

        // orientation guard
        Vec3 n_old = face_normal(f1) + face_normal(f2);
        // determine winding: in f1, is the directed edge a->b present?
        int ia = -1;
        for (int k = 0; k < 3; ++k)
            if (faces[f1][k] == a) ia = k;
        bool ab_in_f1 = faces[f1][(ia + 1) % 3] == b;
        int u = ab_in_f1 ? a : b;
        int v = ab_in_f1 ? b : a;
        // f1 = (u, v, c), f2 = (v, u, d) -> new (u, d, c), (d, v, c)
        std::array<int32_t, 3> nf1 = {(int32_t)u, (int32_t)d, (int32_t)c};
        std::array<int32_t, 3> nf2 = {(int32_t)d, (int32_t)v, (int32_t)c};
        Vec3 n1 = (pos[nf1[1]] - pos[nf1[0]]).cross(pos[nf1[2]] - pos[nf1[0]]);
        Vec3 n2 = (pos[nf2[1]] - pos[nf2[0]]).cross(pos[nf2[2]] - pos[nf2[0]]);
        if (n1.dot(n_old) <= 0.f || n2.dot(n_old) <= 0.f) return false;

        // detach old faces from vertex lists
        for (int e = 0; e < 2; ++e) {
            int fi = ef[e];
            for (int k = 0; k < 3; ++k) {
                auto& lst = vfaces[faces[fi][k]];
                lst.erase(std::remove(lst.begin(), lst.end(), fi),
                          lst.end());
            }
        }
        faces[f1] = nf1;
        faces[f2] = nf2;
        for (int k = 0; k < 3; ++k) {
            vfaces[nf1[k]].push_back(f1);
            vfaces[nf2[k]].push_back(f2);
        }
        if (val) {
            --(*val)[a]; --(*val)[b];
            ++(*val)[c]; ++(*val)[d];
        }
        (void)scratch;
        return true;
    }

    void relax(float l, int n_iter) {
        std::vector<int32_t> r;
        for (int it = 0; it < n_iter; ++it) {
            std::vector<Vec3> target(pos.size());
            for (size_t v = 0; v < pos.size(); ++v) {
                if (!vert_live[v] || vfaces[v].empty()) continue;
                Vec3 acc{0, 0, 0};
                float wsum = 0.f;
                Vec3 nrm{0, 0, 0};
                for (int fi : vfaces[v]) {
                    if (!face_live[fi]) continue;
                    const auto& F = faces[fi];
                    Vec3 c = (pos[F[0]] + pos[F[1]] + pos[F[2]])
                             * (1.f / 3.f);
                    Vec3 n = face_normal(fi);
                    float area = 0.5f * n.norm();
                    acc = acc + c * area;
                    wsum += area;
                    nrm = nrm + n;
                }
                if (wsum <= 0.f) { target[v] = pos[v]; continue; }
                Vec3 t = acc * (1.f / wsum);
                float nn = nrm.norm();
                if (nn > 1e-12f) {
                    nrm = nrm * (1.f / nn);
                    Vec3 delta = t - pos[v];
                    delta = delta - nrm * delta.dot(nrm);
                    target[v] = pos[v] + delta * l;
                } else {
                    target[v] = pos[v];
                }
            }
            for (size_t v = 0; v < pos.size(); ++v)
                if (vert_live[v] && !vfaces[v].empty()) pos[v] = target[v];
        }
    }

    // in-place tombstone removal: rebuild pos/faces/vfaces from the
    // live set (indices are renumbered; callers hold no indices across
    // passes, so this is safe between passes)
    // vremap_out (optional): old->new vertex ids (-1 = dropped);
    // fmap_out (optional): per NEW face, the OLD face id — so callers
    // maintaining per-vertex/per-face side state (the remesh dirty-set)
    // can carry it across the compaction
    void rebuild_compact(std::vector<int32_t>* vremap_out = nullptr,
                         std::vector<int32_t>* fmap_out = nullptr) {
        std::vector<int32_t> remap(pos.size(), -1);
        std::vector<Vec3> new_pos;
        new_pos.reserve(pos.size());
        std::vector<std::array<int32_t, 3>> new_faces;
        new_faces.reserve(faces.size());
        if (fmap_out) {
            fmap_out->clear();
            fmap_out->reserve(faces.size());
        }
        for (size_t f = 0; f < faces.size(); ++f) {
            if (!face_live[f]) continue;
            std::array<int32_t, 3> F;
            for (int k = 0; k < 3; ++k) {
                int u = faces[f][k];
                if (remap[u] < 0) {
                    remap[u] = (int32_t)new_pos.size();
                    new_pos.push_back(pos[u]);
                }
                F[k] = remap[u];
            }
            if (fmap_out) fmap_out->push_back((int32_t)f);
            new_faces.push_back(F);
        }
        if (vremap_out) *vremap_out = remap;
        pos.swap(new_pos);
        faces.swap(new_faces);
        face_live.assign(faces.size(), 1);
        vert_live.assign(pos.size(), 1);
        vfaces.assign(pos.size(), {});
        for (size_t f = 0; f < faces.size(); ++f)
            for (int k = 0; k < 3; ++k)
                vfaces[faces[f][k]].push_back((int32_t)f);
    }

    // write back compacted arrays; returns (nv_out, nf_out)
    void compact(float* verts_out, int32_t* faces_out, int32_t* nv_out,
                 int32_t* nf_out, int v_cap, int f_cap) {
        std::vector<int32_t> remap(pos.size(), -1);
        int nv = 0;
        for (size_t f = 0; f < faces.size(); ++f) {
            if (!face_live[f]) continue;
            for (int k = 0; k < 3; ++k) {
                int u = faces[f][k];
                if (remap[u] < 0) remap[u] = nv++;
            }
        }
        int nf = 0;
        for (size_t f = 0; f < faces.size(); ++f)
            if (face_live[f]) ++nf;
        if (nv > v_cap || nf > f_cap) {
            *nv_out = -nv;     // signal: caller must grow buffers
            *nf_out = -nf;
            return;
        }
        for (size_t u = 0; u < pos.size(); ++u) {
            if (remap[u] >= 0) {
                verts_out[3 * remap[u]] = pos[u].x;
                verts_out[3 * remap[u] + 1] = pos[u].y;
                verts_out[3 * remap[u] + 2] = pos[u].z;
            }
        }
        int fo = 0;
        for (size_t f = 0; f < faces.size(); ++f) {
            if (!face_live[f]) continue;
            for (int k = 0; k < 3; ++k)
                faces_out[3 * fo + k] = remap[faces[f][k]];
            ++fo;
        }
        *nv_out = nv;
        *nf_out = nf;
    }
};

}  // namespace

extern "C" {

// Isotropic remesh toward target edge length: n_passes of
// {split long, collapse short (greedy sequential, guarded), flip,
// relax}.  Buffers are caller-allocated with capacities; on overflow
// *nv/*nf return negated required sizes and no write happens.
// veto_cos / veto_min_len2: opt-in support for thin-tube pinch
// protection (MembraneMesh.remesh_collapse_veto): skip collapsing an
// edge whose endpoint normals diverge more than acos(veto_cos) AND
// whose length exceeds veto_min_len2 — on a tube whose diameter
// approaches the target edge length, the short circumferential edges
// carry strongly divergent normals, and collapsing them is what
// pinches a well-supported junction apart (TwoToruses low-cw regime,
// BASELINE.md round 4).  veto_cos > 1 disables (default).
void remesh_native(const float* verts_in, int nv, const int32_t* faces_in,
                   int nf, float target, int n_passes, float l,
                   int n_relax, int max_valence,
                   float* verts_out, int32_t* faces_out,
                   int32_t* nv_out, int32_t* nf_out,
                   int v_cap, int f_cap,
                   float veto_cos, float veto_min_len2) {
    EditMesh m;
    m.build(verts_in, nv, faces_in, nf);
    const float high2 = (4.f / 3.f * target) * (4.f / 3.f * target);
    const float low2 = (4.f / 5.f * target) * (4.f / 5.f * target);
    std::vector<int32_t> ra, rb, ring;
    const bool dbg = std::getenv("CSW_REMESH_DEBUG") != nullptr;
    using clk = std::chrono::steady_clock;

    // ---- split-scan skipping (behavior-identical) ----
    // A face can only carry a NEW over-long edge if one of its
    // endpoints was repositioned or its edge set was rewritten since
    // the previous split scan (split is unconditional on edge length
    // — no other guard).  Each landed edit stamps exactly the
    // vertices whose position or incident edge set changed (collapse:
    // the kept vertex; split: the new midpoint — every rewritten face
    // contains it; flip: all four vertices of the rewired quad), and
    // passes >= 1 skip faces whose three stamps predate the previous
    // scan.  Identical output asserted in
    // tests/test_mesh.py::test_remesh_dirty_set_identical;
    // CSW_REMESH_NO_DIRTY=1 disables.
    //
    // NOTE a committed negative (round 5): the stronger attempt-level
    // fail-memo (skip collapse/flip attempts whose 2-ring is
    // unchanged since they last failed, with ring-dilated marks) was
    // built, proven output-identical, and MEASURED SLOWER — a growth
    // remesh churns globally (~25k edits/pass dilate over the whole
    // mesh), so <4% of attempts were skippable while the marking
    // cost ~35% of the pass.  The wins here are this scan skip plus
    // the high2 guard reorder in collapse().
    const bool no_dirty = std::getenv("CSW_REMESH_NO_DIRTY") != nullptr;
    const bool dirty_check = std::getenv("CSW_REMESH_DIRTY_CHECK") != nullptr;
    uint64_t seq = 1;
    std::vector<uint64_t> touched(m.pos.size(), 1);
    uint64_t prev_split_scan_seq = 0;
    auto stamp = [&](int v) {
        if ((size_t)v < touched.size()) touched[v] = seq;
        else touched.resize(m.pos.size(), seq);
    };

    for (int pass = 0; pass < n_passes; ++pass) {
        // split pass: iterate faces, split the longest over-long edge
        auto t0 = clk::now();
        long n_edit = 0, n_split = 0, n_coll = 0;
        const uint64_t scan_from = prev_split_scan_seq;
        prev_split_scan_seq = seq;
        size_t nf_now = m.faces.size();
        for (size_t fi = 0; fi < nf_now; ++fi) {
            if (!m.face_live[fi]) continue;
            if (!no_dirty && scan_from > 0) {
                const auto& F = m.faces[fi];
                // endpoint positions unchanged since the last split
                // scan => no edge of this face became long
                if (touched[F[0]] < scan_from && touched[F[1]] < scan_from
                        && touched[F[2]] < scan_from) {
                    if (dirty_check) {
                        for (int k = 0; k < 3; ++k) {
                            int a = F[k], b = F[(k + 1) % 3];
                            if (a < b && (m.pos[a] - m.pos[b]).norm2()
                                    > high2)
                                std::fprintf(stderr,
                                    "SKIP-VIOLATION pass %d face %zu "
                                    "edge (%d,%d) stamps %llu %llu %llu "
                                    "scan_from %llu\n", pass, fi, a, b,
                                    (unsigned long long)touched[F[0]],
                                    (unsigned long long)touched[F[1]],
                                    (unsigned long long)touched[F[2]],
                                    (unsigned long long)scan_from);
                        }
                    }
                    continue;
                }
            }
            for (int k = 0; k < 3; ++k) {
                int a = m.faces[fi][k];
                int b = m.faces[fi][(k + 1) % 3];
                if (a < b &&
                    (m.pos[a] - m.pos[b]).norm2() > high2) {
                    bool did = m.split(a, b);
                    ++n_edit;
                    ++n_split;
                    if (!no_dirty) {
                        ++seq;
                        if (did) {
                            stamp((int)m.pos.size() - 1);
                        } else {
                            // no-op split (nonmanifold transient):
                            // keep the edge dirty so the next pass
                            // retries it like the full scan would
                            stamp(a);
                            stamp(b);
                        }
                    }
                }
            }
        }
        auto t1 = clk::now();

        // collapse pass: sequential greedy over vertices' short edges
        // (result-guarded: may not create an edge above 4/3 target).
        // Candidate prefilter: one face scan marks vertices carrying a
        // short edge; the greedy loop then ring-walks only those.  A
        // collapse repositions only the KEPT vertex, so any NEW short
        // edge is incident to it and its own while(again) loop catches
        // it — behavior-identical to scanning every vertex, but the
        // fit's incremental growth remeshes (few shorts, many splits)
        // skip the ~V ring() walks that dominated the pass (measured
        // 60-70% of remesh wall-clock).
        std::vector<uint8_t> short_cand(m.pos.size(), 0);
        nf_now = m.faces.size();
        for (size_t fi = 0; fi < nf_now; ++fi) {
            if (!m.face_live[fi]) continue;
            for (int k = 0; k < 3; ++k) {
                int a = m.faces[fi][k];
                int b = m.faces[fi][(k + 1) % 3];
                if (a < b && (m.pos[a] - m.pos[b]).norm2() < low2) {
                    short_cand[a] = 1;
                    short_cand[b] = 1;
                }
            }
        }
        long n_cand = 0, n_att = 0;
        for (size_t v = 0; v < m.pos.size(); ++v) {
            if (!m.vert_live[v] || !short_cand[v]) continue;
            ++n_cand;
            bool again = true;
            int guard = 8;
            while (again && guard-- > 0) {
                again = false;
                m.ring((int)v, ring);
                for (int u : ring) {
                    float el2 = (m.pos[v] - m.pos[u]).norm2();
                    if (el2 < low2) {
                        if (veto_cos <= 1.f && el2 > veto_min_len2) {
                            Vec3 na = m.vnormal((int)v);
                            Vec3 nb = m.vnormal(u);
                            float dp = na.dot(nb);
                            float nn = std::sqrt(na.norm2() * nb.norm2())
                                       + 1e-30f;
                            if (dp < veto_cos * nn) continue;
                        }
                        ++n_att;
                        if (m.collapse((int)v, u, max_valence, ra, rb,
                                       high2, &ring)) {
                            again = true;
                            ++n_edit;
                            ++n_coll;
                            if (!no_dirty) {
                                ++seq;
                                stamp((int)v);
                            }
                            break;
                        }
                    }
                }
            }
        }
        auto t2 = clk::now();

        // flip pass.  Candidate prefilter: a flip strictly reduces
        // Sum (valence-6)^2 over the 4 involved vertices (a, b and the
        // two opposite vertices c, d), so it needs at least one of
        // them irregular.  c and d are both adjacent to a AND b, so
        // one face-scan dilation (mark every vertex of a face
        // containing an irregular vertex) makes irr2[a] || irr2[b] an
        // exact superset test at pass start — converged passes then
        // skip the ~E edge_faces() walks that dominated them.
        // Valences drift as flips land, so a mid-pass flip can in
        // rare cases make an UNMARKED vertex irregular (its opposite
        // vertex across a flipped edge); a second-order flip through
        // it waits for the next pass's fresh scan — acceptable in a
        // fixed-point heuristic re-run every pass and every remesh
        // boundary.
        long n_flip = 0, n_fatt = 0;
        {
            std::vector<int32_t> val(m.pos.size(), 0);
            nf_now = m.faces.size();
            for (size_t fi = 0; fi < nf_now; ++fi) {
                if (!m.face_live[fi]) continue;
                for (int k = 0; k < 3; ++k) ++val[m.faces[fi][k]];
            }
            std::vector<uint8_t> irr2(m.pos.size(), 0);
            for (size_t fi = 0; fi < nf_now; ++fi) {
                if (!m.face_live[fi]) continue;
                const auto& F = m.faces[fi];
                if (val[F[0]] != 6 || val[F[1]] != 6 || val[F[2]] != 6)
                    irr2[F[0]] = irr2[F[1]] = irr2[F[2]] = 1;
            }
            for (size_t fi = 0; fi < nf_now; ++fi) {
                if (!m.face_live[fi]) continue;
                for (int k = 0; k < 3; ++k) {
                    int a = m.faces[fi][k];
                    int b = m.faces[fi][(k + 1) % 3];
                    if (a < b && (irr2[a] || irr2[b])) {
                        ++n_fatt;
                        if (m.flip(a, b, ra, &val)) {
                            ++n_flip;
                            if (!no_dirty) {
                                ++seq;
                                // the rewired quad: a, b and the new
                                // diagonal (post-flip faces[fi] holds
                                // (u, d, c))
                                stamp(a);
                                stamp(b);
                                for (int kk = 0; kk < 3; ++kk)
                                    stamp(m.faces[fi][kk]);
                            }
                        }
                    }
                }
            }
        }
        auto t3 = clk::now();

        if (n_relax > 0) {
            m.relax(l, n_relax);
            // relax repositions every vertex: the whole dirty-set is
            // invalidated (fit remeshes run n_relax=0 and keep it)
            if (!no_dirty) {
                ++seq;
                std::fill(touched.begin(), touched.end(), seq);
            }
        }

        // drop accumulated tombstones so later passes don't scan them
        // (a growth remesh otherwise inflates the edit arrays ~6x)
        if (pass + 1 < n_passes) {
            size_t dead = 0;
            for (auto fl : m.face_live) dead += !fl;
            if (dead * 3 > m.faces.size()) {
                m.rebuild_compact();
                if (!no_dirty) {
                    // compaction RENUMBERS vertices, which flips the
                    // split scan's a<b orientation dedup for edges
                    // whose ascending-oriented face died (a baseline
                    // quirk: such edges are uncheckable until a
                    // renumbering happens to restore an ascending
                    // live face) — scan outcomes therefore change
                    // with unchanged positions.  Mark everything
                    // dirty: the next pass scans fully, exactly like
                    // the baseline's post-compact pass (measured: 25
                    // skipped-face divergences on a coarsening
                    // remesh before this reset).
                    ++seq;
                    touched.assign(m.pos.size(), seq);
                }
            }
        }
        auto t4 = clk::now();
        if (dbg) {
            auto ms = [](clk::time_point a, clk::time_point b) {
                return std::chrono::duration<double, std::milli>(
                    b - a).count();
            };
            std::fprintf(stderr,
                         "remesh pass %d: split %.1fms (%ld) collapse "
                         "%.1fms (%ld cand %ld att %ld) flip "
                         "%.1fms (%ld att %ld) tail %.1fms F=%zu\n",
                         pass, ms(t0, t1), n_split, ms(t1, t2), n_coll,
                         n_cand, n_att,
                         ms(t2, t3), n_flip, n_fatt, ms(t3, t4),
                         m.faces.size());
            std::fprintf(stderr,
                         "  collapse fails: ef %ld link %ld val %ld "
                         "high2 %ld fold %ld\n", m.fail_ef,
                         m.fail_link, m.fail_val, m.fail_high2,
                         m.fail_fold);
            m.fail_ef = m.fail_link = m.fail_val = m.fail_high2 =
                m.fail_fold = 0;
        }

        // converged: remaining edits are churn, not progress
        if (n_edit * 100 < (long)m.faces.size())
            break;
    }
    m.compact(verts_out, faces_out, nv_out, nf_out, v_cap, f_cap);
}

// Mean halfedge length (== unique-edge mean on closed meshes, each
// interior edge counted twice) in one streaming pass.  The numpy form
// allocates three (F, 3, 3) temporaries (~0.1 s at 350k faces) and the
// halfedge-table route pays a 3F argsort — this is the per-boundary
// fit-driver query (edge-length schedule logging, grid cell sizing).
double mean_edge_native(const float* verts, const int32_t* faces,
                        int nf) {
    double acc = 0.0;
    for (int f = 0; f < nf; ++f) {
        for (int k = 0; k < 3; ++k) {
            int a = faces[3 * f + k];
            int b = faces[3 * f + (k + 1) % 3];
            double dx = (double)verts[3 * a] - verts[3 * b];
            double dy = (double)verts[3 * a + 1] - verts[3 * b + 1];
            double dz = (double)verts[3 * a + 2] - verts[3 * b + 2];
            acc += std::sqrt(dx * dx + dy * dy + dz * dz);
        }
    }
    return nf ? acc / (3.0 * nf) : 0.0;
}

// Fused neighbor-table build: per-vertex one-ring vertex/face tables
// (K-capped) + per-face edge-adjacent faces.  Single counting-sort
// pass — the host-side prep for every device block.
// want_face_adj=0 skips the twin-matching scan (face_nbrs untouched):
// the production fit path's face_nbrs content is dead (correspondence
// polish off, curvature reads nbr_v/nbr_f only) and the scan is a
// measurable slice of the per-remesh-boundary 'build' phase.
void build_tables_native(const int32_t* faces, int nf, int nv, int K,
                         int32_t* nbr_v, int32_t* nbr_f,
                         int32_t* face_nbrs, int want_face_adj) {
    // counts per source vertex
    std::vector<int32_t> cnt(nv + 1, 0);
    for (int f = 0; f < nf; ++f)
        for (int k = 0; k < 3; ++k) ++cnt[faces[3 * f + k] + 1];
    std::vector<int32_t> start(cnt.begin(), cnt.end());
    for (int v = 0; v < nv; ++v) start[v + 1] += start[v];

    // halfedge lists sorted by src: record (dst, face)
    std::vector<int32_t> he_dst(3 * nf), he_face(3 * nf), he_slot(3 * nf);
    std::vector<int32_t> cursor(start.begin(), start.end() - 1);
    for (int f = 0; f < nf; ++f) {
        for (int k = 0; k < 3; ++k) {
            int src = faces[3 * f + k];
            int dst = faces[3 * f + (k + 1) % 3];
            int pos = cursor[src]++;
            he_dst[pos] = dst;
            he_face[pos] = f;
            he_slot[pos] = k;
        }
    }

    // neighbor tables (first K outgoing halfedges per vertex)
    for (int v = 0; v < nv; ++v) {
        int n = 0;
        for (int p = start[v]; p < start[v + 1] && n < K; ++p, ++n) {
            nbr_v[(size_t)v * K + n] = he_dst[p];
            nbr_f[(size_t)v * K + n] = he_face[p];
        }
        for (; n < K; ++n) {
            nbr_v[(size_t)v * K + n] = -1;
            nbr_f[(size_t)v * K + n] = -1;
        }
    }

    if (!want_face_adj) return;
    // face adjacency: for halfedge (src=v, dst=u) find (src=u, dst=v)
    for (int f = 0; f < nf * 3; ++f) face_nbrs[f] = -1;
    for (int v = 0; v < nv; ++v) {
        for (int p = start[v]; p < start[v + 1]; ++p) {
            int u = he_dst[p];
            int found = -1;
            int n_found = 0;
            for (int q = start[u]; q < start[u + 1]; ++q) {
                if (he_dst[q] == v) {
                    found = he_face[q];
                    ++n_found;
                }
            }
            if (n_found == 1)
                face_nbrs[3 * he_face[p] + he_slot[p]] = found;
        }
    }
}


// ---------------------------------------------------------------------
// Halfedge twin matching for HalfedgeTables (mesh/core.py): twin[h] is
// the reverse-directed halfedge iff both directed edges are singletons
// (equivalent to the numpy searchsorted + dup-severing + back-check
// chain; multiple matches in either direction are non-manifold and
// sever to -1).  dup_out marks directed edges appearing >1x
// (nonmanifold_edges); vhe_out is the first outgoing halfedge per
// vertex.  The numpy formulation costs ~1 s per rebuild at 163k verts
// on this 1-core host (repair() rebuilds several times per call);
// this is one counting-sort + small-bucket scans.
void halfedge_twins_native(const int32_t* faces, int nf, int nv,
                           int32_t* twin_out, uint8_t* dup_out,
                           int32_t* vhe_out) {
    const int64_t nhe = 3LL * nf;
    std::vector<int32_t> cnt(nv + 1, 0);
    for (int64_t h = 0; h < nhe; ++h) ++cnt[faces[h] + 1];
    std::vector<int32_t> start(cnt.begin(), cnt.end());
    for (int v = 0; v < nv; ++v) start[v + 1] += start[v];

    std::vector<int32_t> he_dst(nhe), he_id(nhe);
    std::vector<int32_t> cursor(start.begin(), start.end() - 1);
    for (int f = 0; f < nf; ++f) {
        for (int k = 0; k < 3; ++k) {
            int64_t h = 3LL * f + k;
            int src = faces[h];
            int dst = faces[3LL * f + (k + 1) % 3];
            int pos = cursor[src]++;
            he_dst[pos] = dst;
            he_id[pos] = (int32_t)h;
        }
    }

    for (int v = 0; v < nv; ++v)
        vhe_out[v] = start[v] < start[v + 1] ? he_id[start[v]] : -1;
    // buckets are filled in ascending h, but the FIRST outgoing
    // halfedge by id is what numpy's reversed write kept; he_id[start]
    // is already the minimum since insertion order is h-ascending.

    for (int v = 0; v < nv; ++v) {
        for (int p = start[v]; p < start[v + 1]; ++p) {
            int dst = he_dst[p];
            int32_t h = he_id[p];
            // own-direction duplicate count within bucket[v]
            int n_dir = 0;
            for (int q = start[v]; q < start[v + 1]; ++q)
                if (he_dst[q] == dst) ++n_dir;
            dup_out[h] = n_dir > 1;
            // reverse matches in bucket[dst]
            int n_rev = 0;
            int32_t rev = -1;
            for (int q = start[dst]; q < start[dst + 1]; ++q) {
                if (he_dst[q] == v) {
                    rev = he_id[q];
                    ++n_rev;
                }
            }
            twin_out[h] = (n_dir == 1 && n_rev == 1) ? rev : -1;
        }
    }
}


// ---------------------------------------------------------------------
// Face hygiene for repair() (mesh/core.py): one pass computing, per
// face, bad = degenerate | duplicate (same sorted vertex triple as an
// earlier face) | incident on an over-shared undirected edge (>2 face
// incidences).  Replaces two np.unique key sorts (~0.6 s/pass at 163k
// verts) with one 64-bit sort + counting-sort bucket scans.  Caller
// guarantees nv < 2^21 so a sorted triple packs into 63 bits.
void face_hygiene_native(const int32_t* faces, int nf, int nv,
                         uint8_t* bad_out) {
    std::memset(bad_out, 0, nf);

    // degenerate + duplicate faces
    std::vector<std::pair<int64_t, int32_t>> keys(nf);
    for (int f = 0; f < nf; ++f) {
        int32_t a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
        if (a == b || b == c || a == c) bad_out[f] = 1;
        int32_t lo = std::min(a, std::min(b, c));
        int32_t hi = std::max(a, std::max(b, c));
        int32_t mid = (int32_t)((int64_t)a + b + c - lo - hi);
        keys[f] = {((int64_t)lo << 42) | ((int64_t)mid << 21) | hi, f};
    }
    std::sort(keys.begin(), keys.end());
    for (int i = 1; i < nf; ++i)
        if (keys[i].first == keys[i - 1].first)
            bad_out[keys[i].second] = 1;  // keep lowest face index only

    // undirected edges incident on >2 faces: bucket by lo endpoint
    const int64_t nhe = 3LL * nf;
    std::vector<int32_t> cnt(nv + 1, 0);
    std::vector<int32_t> e_lo(nhe), e_hi(nhe);
    for (int f = 0; f < nf; ++f) {
        for (int k = 0; k < 3; ++k) {
            int32_t a = faces[3 * f + k];
            int32_t b = faces[3 * f + (k + 1) % 3];
            int64_t h = 3LL * f + k;
            e_lo[h] = std::min(a, b);
            e_hi[h] = std::max(a, b);
            ++cnt[e_lo[h] + 1];
        }
    }
    for (int v = 0; v < nv; ++v) cnt[v + 1] += cnt[v];
    std::vector<int32_t> b_hi(nhe), b_h(nhe);
    std::vector<int32_t> cursor(cnt.begin(), cnt.end() - 1);
    for (int64_t h = 0; h < nhe; ++h) {
        int pos = cursor[e_lo[h]]++;
        b_hi[pos] = e_hi[h];
        b_h[pos] = (int32_t)h;
    }
    for (int v = 0; v < nv; ++v) {
        for (int p = cnt[v]; p < cnt[v + 1]; ++p) {
            int n_inc = 0;
            for (int q = cnt[v]; q < cnt[v + 1]; ++q)
                if (b_hi[q] == b_hi[p]) ++n_inc;
            if (n_inc > 2) bad_out[b_h[p] / 3] = 1;
        }
    }
}


// ---------------------------------------------------------------------
// Vertex connected components over the face-edge graph (union-find
// with path halving).  Labels are assigned in order of first
// appearance scanning vertices 0..nv-1 — the same convention as
// scipy.sparse.csgraph.connected_components, which this replaces on
// the repair/remove_inner_surfaces path.  Returns the component count.
int32_t vertex_components_native(const int32_t* faces, int nf, int nv,
                                 int32_t* labels_out) {
    std::vector<int32_t> parent(nv);
    for (int v = 0; v < nv; ++v) parent[v] = v;
    auto find = [&parent](int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    };
    for (int f = 0; f < nf; ++f) {
        int32_t a = find(faces[3 * f]);
        int32_t b = find(faces[3 * f + 1]);
        int32_t c = find(faces[3 * f + 2]);
        if (a != b) parent[a] = b;
        int32_t r = find(b);
        if (c != r && find(c) != r) parent[find(c)] = r;
    }
    std::vector<int32_t> rootlab(nv, -1);
    int32_t n = 0;
    for (int v = 0; v < nv; ++v) {
        int32_t r = find(v);
        if (rootlab[r] < 0) rootlab[r] = n++;
        labels_out[v] = rootlab[r];
    }
    return n;
}


// ---------------------------------------------------------------------
// best-mass window bases for the sliding-ring gather schedule
// (ops/pallas_gather.ring_gather_schedule): per 128-row index chunk,
// the 128-aligned start of the densest `span`-wide window over the
// chunk's cared targets.  The numpy formulation (per-chunk sort +
// global searchsorted) costs ~12 s at 13M rows on this 1-core host;
// this runs the same computation in one cache-resident pass.
void best_mass_bases(const int32_t* idx, const uint8_t* care,
                     int64_t n_rows, int chunk, int span,
                     int32_t n_src, int32_t* bases_out) {
    int64_t nc = n_rows / chunk;
    std::vector<int32_t> buf(chunk);
    int32_t n_al = ((n_src + 127) / 128) * 128;
    int32_t maxbase = n_al - span > 0 ? n_al - span : 0;
    int32_t eff = span - 128;
    for (int64_t c = 0; c < nc; ++c) {
        int m = 0;
        const int32_t* row = idx + c * chunk;
        const uint8_t* cr = care + c * chunk;
        for (int j = 0; j < chunk; ++j)
            if (cr[j]) buf[m++] = row[j];
        if (m == 0) { bases_out[c] = 0; continue; }
        std::sort(buf.begin(), buf.begin() + m);
        // sliding count of targets in [buf[j], buf[j] + eff]
        int best = 0, bestcnt = -1, hi = 0;
        for (int j = 0; j < m; ++j) {
            if (hi < j) hi = j;
            while (hi < m && buf[hi] <= buf[j] + eff) ++hi;
            if (hi - j > bestcnt) { bestcnt = hi - j; best = j; }
        }
        int32_t base = (buf[best] / 128) * 128;
        if (base >= n_src) base = 0;
        if (base > maxbase) base = maxbase;
        if (base < 0) base = 0;
        bases_out[c] = base;
    }
}

// ---------------------------------------------------------------------
// Vertex->incident-corner-row table (ops/meshdata.incidence_table):
// counting sort of the valid flat face-corner rows by their vertex.
// Per vertex, rows ascend; the first K fill the table, the rest land
// on the overflow lists in (vertex, row) order — byte-matching the
// numpy stable-argsort formulation.
void incidence_native(const int32_t* faces, const uint8_t* fmask,
                      int64_t nf, int32_t nv, int K,
                      int32_t* inc,        // (nv*K,) -1-filled by caller
                      int32_t* ov_rows, int32_t* ov_verts,
                      int64_t ov_cap, int64_t* n_ov) {
    std::vector<int32_t> cnt(nv + 1, 0);
    for (int64_t f = 0; f < nf; ++f) {
        if (!fmask[f]) continue;
        for (int c = 0; c < 3; ++c) {
            int32_t v = faces[f * 3 + c];
            if (v >= 0 && v < nv) ++cnt[v];
        }
    }
    std::vector<int64_t> off(nv + 1, 0);
    for (int32_t v = 0; v < nv; ++v) off[v + 1] = off[v] + cnt[v];
    std::vector<int32_t> rows(off[nv]);
    std::vector<int32_t> fill(nv, 0);
    for (int64_t f = 0; f < nf; ++f) {
        if (!fmask[f]) continue;
        for (int c = 0; c < 3; ++c) {
            int32_t v = faces[f * 3 + c];
            if (v >= 0 && v < nv)
                rows[off[v] + fill[v]++] = (int32_t)(f * 3 + c);
        }
    }
    int64_t nov = 0;
    for (int32_t v = 0; v < nv; ++v) {
        int32_t m = fill[v];
        for (int32_t j = 0; j < m; ++j) {
            if (j < K) {
                inc[(int64_t)v * K + j] = rows[off[v] + j];
            } else {
                if (nov < ov_cap) {
                    ov_rows[nov] = rows[off[v] + j];
                    ov_verts[nov] = v;
                }
                ++nov;
            }
        }
    }
    *n_ov = nov;
}

// ---------------------------------------------------------------------
// Full ring-gather schedule (ops/pallas_gather.ring_gather_schedule,
// fixed-layout production path) in one cache-resident pass: best-mass
// window bases, ring/patch residency, patch bookkeeping, DMA
// descriptors, index rewrite, patch targets and the uncovered-row
// fixup list.  The numpy formulation costs ~0.6 s per fit-capacity
// topology rebuild on this 1-core host (x19 rebuilds per north-star
// fit); this runs in ~0.1 s.  Semantics byte-match the numpy path
// (tests/test_ring_gather.py::test_ring_schedule_native_matches_numpy).
void ring_schedule_native(
    const int32_t* idx, const uint8_t* care, int64_t R,
    int32_t n_src, int span,
    int ring_segs, int patch_segs, int patch_chunk_segs, int cps,
    int32_t* bases,        // (nc,)
    int32_t* pbases,       // (nc,)
    int32_t* dmas,         // (n_steps*8,)
    int32_t* idx_patched,  // (Rp,) caller passes idx copied+padded
    int32_t* targets,      // (patch_cap,) zero-filled by caller
    int32_t* uncov,        // (uncov_cap,) -1-filled by caller
    int64_t patch_cap, int64_t uncov_cap,
    int64_t* n_patch_out, int64_t* n_uncov_out) {
    const int64_t step_rows = (int64_t)cps * 128;
    const int64_t n_steps = (R + step_rows - 1) / step_rows;
    const int64_t Rp = n_steps * step_rows;
    const int64_t nc = Rp / 128;
    const int32_t n_al = ((n_src + 127) / 128) * 128;
    const int32_t patch_lane0 = n_al;

    // pass 1: per-chunk best-mass bases over the padded row range
    // (pad rows read idx 0 / care 0 via the guards below)
    std::vector<int64_t> care_chunks;   // chunk ids with >=1 care row
    std::vector<int64_t> chunk_med;     // per-care-chunk value median
    {
        std::vector<int32_t> buf(128);
        int32_t maxbase = n_al - span > 0 ? n_al - span : 0;
        int32_t eff = span - 128;
        for (int64_t c = 0; c < nc; ++c) {
            int m = 0;
            int32_t mn = INT32_MAX, mx = INT32_MIN;
            for (int j = 0; j < 128; ++j) {
                int64_t r = c * 128 + j;
                if (r < R && care[r]) {
                    int32_t v = idx[r];
                    buf[m++] = v;
                    if (v < mn) mn = v;
                    if (v > mx) mx = v;
                }
            }
            if (m == 0) { bases[c] = 0; continue; }
            care_chunks.push_back(c);
            int32_t base;
            if (mx - mn <= eff) {
                // whole chunk fits one window: the two-pointer scan on
                // the sorted buffer would find bestcnt == m at j == 0
                // (first-on-ties), i.e. base = (min/128)*128 — same
                // result without the sort (the common case on
                // Hilbert-sorted fit streams; the sort dominated the
                // pass).  The clamp median only needs the (m-1)/2
                // order statistic: nth_element.
                std::nth_element(buf.begin(), buf.begin() + (m - 1) / 2,
                                 buf.begin() + m);
                chunk_med.push_back(buf[(m - 1) / 2]);
                base = (mn / 128) * 128;
            } else {
                std::sort(buf.begin(), buf.begin() + m);
                chunk_med.push_back(buf[(m - 1) / 2]);
                int best = 0, bestcnt = -1, hi = 0;
                for (int j = 0; j < m; ++j) {
                    if (hi < j) hi = j;
                    while (hi < m && buf[hi] <= buf[j] + eff) ++hi;
                    if (hi - j > bestcnt) { bestcnt = hi - j; best = j; }
                }
                base = (buf[best] / 128) * 128;
            }
            if (base >= n_src) base = 0;
            if (base > maxbase) base = maxbase;
            if (base < 0) base = 0;
            bases[c] = base;
        }
    }

    // pass 1b: anchor clamp — bound each care-chunk's base to the
    // running lower-median of the surrounding +/-ANCHOR_W care-chunk
    // medians over the VALID window only (no edge replication: a
    // replicated edge window lets an outlier at either end of the
    // stream dominate its own anchor).  Outlier-driven far-ahead
    // bases drag the monotone prefetch head with them and strip ring
    // residency from every trailing chunk within the ring span;
    // clamped, the outliers only cost their own patch rows.  Must
    // stay bit-identical to ops/pallas_gather._anchor_clamp_bases.
    {
        const int64_t W = 16;           // ANCHOR_W
        const int64_t AHEAD = 4096;     // ANCHOR_AHEAD
        const int64_t K = (int64_t)care_chunks.size();
        int64_t maxbase = n_al - span > 0 ? n_al - span : 0;
        std::vector<int64_t> win;
        win.reserve(2 * W + 1);
        for (int64_t i = 0; i < K; ++i) {
            int64_t lo_i = i - W > 0 ? i - W : 0;
            int64_t hi_i = i + W < K - 1 ? i + W : K - 1;
            win.assign(chunk_med.begin() + lo_i,
                       chunk_med.begin() + hi_i + 1);
            int64_t mi = (int64_t)(win.size() - 1) / 2;
            std::nth_element(win.begin(), win.begin() + mi, win.end());
            int64_t anchor = win[mi];
            int64_t lo = anchor - AHEAD > 0 ? anchor - AHEAD : 0;
            int64_t hi = anchor + AHEAD;
            int64_t b = bases[care_chunks[i]];
            if (b < lo) b = lo;
            if (b > hi) b = hi;
            b = (b / 128) * 128;
            if (b < 0) b = 0;
            if (b > maxbase) b = maxbase;
            bases[care_chunks[i]] = (int32_t)b;
        }
    }

    // pass 2: ring heads (running max of seg_hi) per step, then the
    // main-ring residency bound per chunk
    std::vector<int64_t> step_hi(n_steps), next_head(n_steps);
    {
        int64_t head = 0;
        for (int64_t s = 0; s < n_steps; ++s) {
            for (int64_t k = 0; k < cps; ++k) {
                int64_t sh = (int64_t)(bases[s * cps + k] + span) / 128;
                if (sh > head) head = sh;
            }
            step_hi[s] = head;
        }
        for (int64_t s = 0; s + 1 < n_steps; ++s)
            next_head[s] = step_hi[s + 1];
        next_head[n_steps - 1] = step_hi[n_steps - 1];
    }

    // pass 3: row classification (cov / patch), running patch
    // positions, per-chunk patch bases
    std::vector<int32_t> ppos_row(Rp, -1);   // patch pos per patch row
    std::vector<uint8_t> has_patch(nc, 0);
    int64_t n_patch_rows = 0;
    for (int64_t c = 0; c < nc; ++c) {
        int64_t s = c / cps;
        bool resident = (int64_t)(bases[c] / 128)
                        >= next_head[s] - ring_segs;
        int32_t first_ppos = -1;
        for (int j = 0; j < 128; ++j) {
            int64_t r = c * 128 + j;
            bool cr = (r < R) && care[r];
            int32_t v = (r < R) ? idx[r] : 0;
            int64_t off = (int64_t)v - bases[c];
            bool cov = cr && resident && off >= 0 && off < span;
            if (cr && !cov) {
                ppos_row[r] = (int32_t)n_patch_rows;
                if (first_ppos < 0) first_ppos = (int32_t)n_patch_rows;
                ++n_patch_rows;
            }
        }
        if (first_ppos >= 0) {
            has_patch[c] = 1;
            pbases[c] = (first_ppos / 128) * 128;
        } else {
            pbases[c] = 0;
        }
    }

    // pass 4: patch-ring heads + residency, then the final per-row
    // rewrite / target staging / uncovered fixup list
    std::vector<int64_t> p_step_hi(n_steps), p_next(n_steps);
    {
        int64_t head = 0;
        for (int64_t s = 0; s < n_steps; ++s) {
            for (int64_t k = 0; k < cps; ++k) {
                int64_t c = s * cps + k;
                int64_t ph = has_patch[c]
                    ? (int64_t)(pbases[c] + patch_chunk_segs * 128) / 128
                    : 0;
                if (ph > head) head = ph;
            }
            p_step_hi[s] = head;
        }
        for (int64_t s = 0; s + 1 < n_steps; ++s)
            p_next[s] = p_step_hi[s + 1];
        p_next[n_steps - 1] = p_step_hi[n_steps - 1];
    }
    int64_t n_uncov = 0;
    for (int64_t c = 0; c < nc; ++c) {
        int64_t s = c / cps;
        bool p_res = (int64_t)(pbases[c] / 128) >= p_next[s] - patch_segs;
        for (int j = 0; j < 128; ++j) {
            int64_t r = c * 128 + j;
            int32_t pp = ppos_row[r];
            if (pp < 0) continue;               // not a patch row
            int32_t v = idx[r];                 // patch rows are < R
            if (pp < patch_cap) targets[pp] = v;
            bool fit = (pp - pbases[c]) < patch_chunk_segs * 128;
            if (p_res && fit) {
                idx_patched[r] = patch_lane0 + pp;
            } else {
                if (n_uncov < uncov_cap) uncov[n_uncov] = (int32_t)r;
                ++n_uncov;
            }
        }
    }

    // pass 5: DMA descriptors (split at the ring wrap; empty copies
    // encoded as idempotent 1-segment re-copies), [main | patch] per
    // step
    for (int pass = 0; pass < 2; ++pass) {
        const std::vector<int64_t>& hi_v = pass ? p_step_hi : step_hi;
        int64_t segs = pass ? patch_segs : ring_segs;
        int64_t h0 = pass ? (p_step_hi[0] > 1 ? p_step_hi[0] : 1)
                          : step_hi[0];
        int64_t prev = h0 - segs > 0 ? h0 - segs : 0;
        for (int64_t s = 0; s < n_steps; ++s) {
            int64_t hi_s = hi_v[s];
            if (pass && hi_s < 1) hi_s = 1;     // np.maximum(p_step_hi, 1)
            int64_t lo = prev;
            if (lo < hi_s - segs) lo = hi_s - segs;
            int64_t ln = hi_s - lo;
            if (ln <= 0) {      // numpy: lo=max(hi-1,0), ln=min(1,max(hi,1))=1
                lo = hi_s - 1 > 0 ? hi_s - 1 : 0;
                ln = 1;
            }
            int64_t r_lo = lo % segs;
            int64_t first = ln < segs - r_lo ? ln : segs - r_lo;
            int32_t* d = dmas + s * 8 + pass * 4;
            d[0] = (int32_t)lo;
            d[1] = (int32_t)first;
            d[2] = (int32_t)(lo + first);
            d[3] = (int32_t)(ln - first);
            if (ln - first == 0) {
                d[2] = (int32_t)(lo + first - 1 > 0 ? lo + first - 1 : 0);
                d[3] = (int32_t)(lo + first < 1 ? lo + first : 1);
            }
            prev = hi_s;
        }
    }
    *n_patch_out = n_patch_rows;
    *n_uncov_out = n_uncov;
}

// ---------------------------------------------------------------------
// Bounded k-th-nearest-neighbor field (the wrap_start density field,
// counterpart of the reference's cKDTree query in
// /root/reference/ch_shrinkwrap/holepunch.py:88-112).  Exact within
// `bound`: out[q] = distance from queries[q] to its k-th nearest point
// if that lies within `bound`, else 2*bound (caller clamps — matching
// scipy's distance_upper_bound -> inf semantics).
//
// Design for the wrap_start workload (1e6 points on a thin shell,
// ~120k grid-node queries, most of them deep inside the hollow
// interior where a kd-tree's bounded search is at its WORST): points
// are counting-sorted into a uniform cell grid once, a 2-pass
// chessboard distance transform over cell occupancy gives every query
// an O(1) lower bound that rejects interior/exterior nodes
// immediately, and the survivors run an expanding-ring search with a
// k-element max-heap and exact cell-AABB pruning.
// The grid/transform build depends only on the point set; the punch
// driver queries the SAME 1e6-point cloud at every boundary, so the
// build is exposed as a reusable handle (knn_field_build/query/free)
// with knn_field_native kept as the one-shot compatibility wrapper.
struct KnnFieldHandle {
    std::vector<float> pts;   // owned copy, (n, 3)
    int64_t n_pts;
    float lo[3];
    float hi[3];
    float cell;
    int dims[3];
    std::vector<int32_t> starts, order, cheb;
};

void* knn_field_build_native(const float* pts, int64_t n_pts) {
    if (n_pts <= 0) return nullptr;
    KnnFieldHandle* h = new KnnFieldHandle();
    h->pts.assign(pts, pts + 3 * n_pts);
    h->n_pts = n_pts;
    float* lo = h->lo;
    float* hi = h->hi;
    for (int d = 0; d < 3; ++d) lo[d] = hi[d] = pts[d];
    for (int64_t i = 1; i < n_pts; ++i)
        for (int d = 0; d < 3; ++d) {
            float v = pts[3 * i + d];
            if (v < lo[d]) lo[d] = v;
            if (v > hi[d]) hi[d] = v;
        }
    float maxext = 1e-6f;
    for (int d = 0; d < 3; ++d)
        if (hi[d] - lo[d] > maxext) maxext = hi[d] - lo[d];
    // ~n_pts cells (1 pt/cell average), dims capped
    int target_dim = (int)std::cbrt((double)n_pts) + 1;
    if (target_dim > 256) target_dim = 256;
    if (target_dim < 4) target_dim = 4;
    float cell = maxext / (float)target_dim;
    if (cell <= 0) cell = 1.0f;
    h->cell = cell;
    int* dims = h->dims;
    for (int d = 0; d < 3; ++d) {
        dims[d] = (int)((hi[d] - lo[d]) / cell) + 1;
        if (dims[d] < 1) dims[d] = 1;
    }
    const int64_t sy = dims[2], sx = (int64_t)dims[1] * dims[2];
    const int64_t ncells = (int64_t)dims[0] * sx;

    auto cell_coord = [&](const float* p, int* c) {
        for (int d = 0; d < 3; ++d) {
            int v = (int)((p[d] - lo[d]) / cell);
            if (v < 0) v = 0;
            if (v >= dims[d]) v = dims[d] - 1;
            c[d] = v;
        }
    };

    // counting sort of points into cells
    std::vector<int32_t> cell_of(n_pts);
    std::vector<int32_t>& starts = h->starts;
    starts.assign(ncells + 1, 0);
    for (int64_t i = 0; i < n_pts; ++i) {
        int c[3];
        cell_coord(pts + 3 * i, c);
        int64_t ci = c[0] * sx + c[1] * sy + c[2];
        cell_of[i] = (int32_t)ci;
        ++starts[ci + 1];
    }
    for (int64_t c = 0; c < ncells; ++c) starts[c + 1] += starts[c];
    std::vector<int32_t>& order = h->order;
    order.resize(n_pts);
    {
        std::vector<int32_t> cur(starts.begin(), starts.end() - 1);
        for (int64_t i = 0; i < n_pts; ++i)
            order[cur[cell_of[i]]++] = (int32_t)i;
    }

    // chessboard distance transform (in cells) to the nearest occupied
    // cell: 2-pass raster scan with the 13+13 half-neighborhoods.  A
    // query in cell c is >= (cheb[c]-1)*cell away from every point.
    const int32_t INF = 1 << 29;
    std::vector<int32_t>& cheb = h->cheb;
    cheb.resize(ncells);
    for (int64_t c = 0; c < ncells; ++c)
        cheb[c] = (starts[c + 1] > starts[c]) ? 0 : INF;
    auto relax_pass = [&](bool forward) {
        int x0 = forward ? 0 : dims[0] - 1, x1 = forward ? dims[0] : -1;
        int step = forward ? 1 : -1;
        for (int x = x0; x != x1; x += step)
            for (int y = forward ? 0 : dims[1] - 1;
                 y != (forward ? dims[1] : -1); y += step)
                for (int z = forward ? 0 : dims[2] - 1;
                     z != (forward ? dims[2] : -1); z += step) {
                    int64_t c = x * sx + y * sy + z;
                    int32_t best = cheb[c];
                    if (best == 0) continue;
                    // scan the 13 already-visited neighbors this pass
                    for (int dx = -1; dx <= 1; ++dx)
                        for (int dy = -1; dy <= 1; ++dy)
                            for (int dz = -1; dz <= 1; ++dz) {
                                if (dx == 0 && dy == 0 && dz == 0)
                                    continue;
                                // visited = lexicographically before in
                                // this pass's scan order
                                int key = dx * 9 + dy * 3 + dz;
                                if (forward ? key > 0 : key < 0)
                                    continue;
                                int nx2 = x + dx, ny2 = y + dy,
                                    nz2 = z + dz;
                                if (nx2 < 0 || nx2 >= dims[0]
                                    || ny2 < 0 || ny2 >= dims[1]
                                    || nz2 < 0 || nz2 >= dims[2])
                                    continue;
                                int32_t v =
                                    cheb[nx2 * sx + ny2 * sy + nz2] + 1;
                                if (v < best) best = v;
                            }
                    cheb[c] = best;
                }
    };
    relax_pass(true);
    relax_pass(false);
    return h;
}

void knn_field_free_native(void* hv) {
    delete static_cast<KnnFieldHandle*>(hv);
}

void knn_field_query_native(void* hv, const float* queries, int64_t n_q,
                            int k, float bound, float* out) {
    const float miss = 2.0f * bound;
    if (n_q <= 0) return;
    KnnFieldHandle* h = static_cast<KnnFieldHandle*>(hv);
    if (h == nullptr || h->n_pts < k || k <= 0 || bound <= 0) {
        for (int64_t q = 0; q < n_q; ++q) out[q] = miss;
        return;
    }
    const float* pts = h->pts.data();
    const float* lo = h->lo;
    const float* hi = h->hi;
    const float cell = h->cell;
    const int* dims = h->dims;
    const int64_t sy = dims[2], sx = (int64_t)dims[1] * dims[2];
    const std::vector<int32_t>& starts = h->starts;
    const std::vector<int32_t>& order = h->order;
    const std::vector<int32_t>& cheb = h->cheb;
    auto cell_coord = [&](const float* p, int* c) {
        for (int d = 0; d < 3; ++d) {
            int v = (int)((p[d] - lo[d]) / cell);
            if (v < 0) v = 0;
            if (v >= dims[d]) v = dims[d] - 1;
            c[d] = v;
        }
    };

    const float bound2 = bound * bound;
    std::vector<float> heap(k);   // max-heap of squared distances

    for (int64_t q = 0; q < n_q; ++q) {
        const float* Q = queries + 3 * q;
        int cq[3];
        cell_coord(Q, cq);
        // off-grid queries: account for the gap from Q to the clamped
        // cell (the chamfer bound below is measured from that cell)
        float off2 = 0.0f;
        for (int d = 0; d < 3; ++d) {
            float g = 0.0f;
            if (Q[d] < lo[d]) g = lo[d] - Q[d];
            else if (Q[d] > hi[d]) g = Q[d] - hi[d];
            off2 += g * g;
        }
        if (off2 > bound2) { out[q] = miss; continue; }
        int64_t cqi = cq[0] * sx + cq[1] * sy + cq[2];
        float lb = (float)(cheb[cqi] - 1) * cell;
        if (lb > 0 && lb * lb + off2 > bound2) { out[q] = miss; continue; }

        int hn = 0;
        float cur2 = bound2;    // current pruning radius^2
        int max_ring = (int)(bound / cell) + 2;
        int r0 = cheb[cqi] > 1 ? cheb[cqi] - 1 : 0;

        auto scan_cell = [&](int x, int y, int z) {
            if (x < 0 || x >= dims[0] || y < 0 || y >= dims[1]
                || z < 0 || z >= dims[2])
                return;
            int64_t ci = x * sx + y * sy + z;
            int32_t s = starts[ci], e = starts[ci + 1];
            if (s == e) return;
            // exact AABB minimum distance
            float mind2 = 0.0f;
            float cl[3] = {lo[0] + x * cell, lo[1] + y * cell,
                           lo[2] + z * cell};
            for (int d = 0; d < 3; ++d) {
                float g = 0.0f;
                if (Q[d] < cl[d]) g = cl[d] - Q[d];
                else if (Q[d] > cl[d] + cell) g = Q[d] - (cl[d] + cell);
                mind2 += g * g;
            }
            if (mind2 > cur2) return;
            for (int32_t ii = s; ii < e; ++ii) {
                const float* P = pts + 3 * (int64_t)order[ii];
                float dx = Q[0] - P[0], dy = Q[1] - P[1],
                      dz = Q[2] - P[2];
                float d2 = dx * dx + dy * dy + dz * dz;
                if (d2 > cur2) continue;
                if (hn < k) {
                    heap[hn++] = d2;
                    std::push_heap(heap.begin(), heap.begin() + hn);
                    if (hn == k) cur2 = heap[0];
                } else if (d2 < heap[0]) {
                    std::pop_heap(heap.begin(), heap.begin() + k);
                    heap[k - 1] = d2;
                    std::push_heap(heap.begin(), heap.begin() + k);
                    cur2 = heap[0];
                }
            }
        };

        for (int r = r0; r <= max_ring; ++r) {
            if (r > 0) {
                float ringlb = (float)(r - 1) * cell;
                if (ringlb * ringlb > cur2) break;
            }
            if (r == 0) {
                scan_cell(cq[0], cq[1], cq[2]);
                continue;
            }
            // canonical shell decomposition (each cell exactly once)
            for (int dx = -r; dx <= r; ++dx)
                for (int dy = -r; dy <= r; ++dy) {
                    scan_cell(cq[0] + dx, cq[1] + dy, cq[2] - r);
                    scan_cell(cq[0] + dx, cq[1] + dy, cq[2] + r);
                }
            for (int dx = -r; dx <= r; ++dx)
                for (int dz = -r + 1; dz <= r - 1; ++dz) {
                    scan_cell(cq[0] + dx, cq[1] - r, cq[2] + dz);
                    scan_cell(cq[0] + dx, cq[1] + r, cq[2] + dz);
                }
            for (int dy = -r + 1; dy <= r - 1; ++dy)
                for (int dz = -r + 1; dz <= r - 1; ++dz) {
                    scan_cell(cq[0] - r, cq[1] + dy, cq[2] + dz);
                    scan_cell(cq[0] + r, cq[1] + dy, cq[2] + dz);
                }
        }
        out[q] = (hn == k && heap[0] <= bound2)
                     ? std::sqrt(heap[0]) : miss;
    }
}

// one-shot compatibility wrapper (wrap_start, ad-hoc callers)
void knn_field_native(const float* pts, int64_t n_pts,
                      const float* queries, int64_t n_q,
                      int k, float bound, float* out) {
    if (n_q <= 0) return;
    if (n_pts < k || k <= 0 || bound <= 0) {
        const float miss = 2.0f * bound;
        for (int64_t q = 0; q < n_q; ++q) out[q] = miss;
        return;
    }
    void* h = knn_field_build_native(pts, n_pts);
    knn_field_query_native(h, queries, n_q, k, bound, out);
    knn_field_free_native(h);
}

// Hilbert codes from pre-quantized (n,3) uint32 coordinates (Skilling,
// "Programming the Hilbert curve", 2004).  Bit-exact twin of the numpy
// loops in ops.correspondence.hilbert_order — the quantization stays in
// numpy (vector ops are cheap there); the 9x3-pass transpose transform
// and the 3*bits-pass bit interleave are the wall-clock and go here.
static inline uint64_t hilbert_one(uint32_t x0, uint32_t x1, uint32_t x2,
                                   int bits) {
    const uint32_t M = 1u << (bits - 1);
    uint32_t X[3] = {x0, x1, x2};
    // inverse undo
    for (uint32_t Q = M; Q > 1; Q >>= 1) {
        const uint32_t P = Q - 1;
        for (int i = 0; i < 3; ++i) {
            if (X[i] & Q) {
                X[0] ^= P;
            } else {
                const uint32_t t = (X[0] ^ X[i]) & P;
                X[0] ^= t;
                X[i] ^= t;
            }
        }
    }
    // Gray encode
    X[1] ^= X[0];
    X[2] ^= X[1];
    uint32_t t = 0;
    for (uint32_t Q = M; Q > 1; Q >>= 1)
        if (X[2] & Q) t ^= Q - 1;
    X[0] ^= t;
    X[1] ^= t;
    X[2] ^= t;
    // transpose-interleave, axis 0 holds MSBs
    uint64_t code = 0;
    for (int b = bits - 1; b >= 0; --b)
        for (int i = 0; i < 3; ++i)
            code = (code << 1) | ((X[i] >> b) & 1u);
    return code;
}

void hilbert_codes_native(const uint32_t* Xin, int64_t n, int bits,
                          uint64_t* out) {
    for (int64_t j = 0; j < n; ++j)
        out[j] = hilbert_one(Xin[3 * j], Xin[3 * j + 1], Xin[3 * j + 2],
                             bits);
}

// Fused face-centroid Hilbert codes: centroid + bbox + quantize +
// code in two streaming passes, replacing the per-remesh-boundary
// numpy chain in mesh.core.spatial_sort (fc = v[f].mean(1) gather +
// float64 convert + separate code pass — measured ~110 ms of the
// ~170 ms boundary sort at 164k verts; this pass runs in ~8 ms).
// Matches the numpy path bit-for-bit: float32 (a+b)+c then /3
// centroid (numpy mean over a 3-row axis), float64 quantization with
// the same expression tree as ops.correspondence.hilbert_codes_for.
void face_hilbert_codes_native(const float* verts, const int32_t* faces,
                               int64_t nf, int bits, uint64_t* out) {
    double lo[3] = {1e300, 1e300, 1e300};
    double hi[3] = {-1e300, -1e300, -1e300};
    std::vector<float> cent(3 * nf);
    for (int64_t f = 0; f < nf; ++f) {
        const float* p0 = verts + 3 * faces[3 * f];
        const float* p1 = verts + 3 * faces[3 * f + 1];
        const float* p2 = verts + 3 * faces[3 * f + 2];
        for (int k = 0; k < 3; ++k) {
            float c = ((p0[k] + p1[k]) + p2[k]) / 3.0f;
            cent[3 * f + k] = c;
            double cd = (double)c;
            if (cd < lo[k]) lo[k] = cd;
            if (cd > hi[k]) hi[k] = cd;
        }
    }
    const double scale = (double)((1u << bits) - 1);
    double inv[3];
    for (int k = 0; k < 3; ++k) {
        double d = hi[k] - lo[k];
        inv[k] = d > 1e-12 ? d : 1e-12;
    }
    for (int64_t f = 0; f < nf; ++f) {
        uint32_t X[3];
        for (int k = 0; k < 3; ++k) {
            double c = (double)cent[3 * f + k];
            X[k] = (uint32_t)((c - lo[k]) / inv[k] * scale);
        }
        out[f] = hilbert_one(X[0], X[1], X[2], bits);
    }
}

// Gaussian curvature per vertex: host C++ twin of the K-only subset of
// ops/curvature.py::curvature_grad (method='lsq', itself the rebuild
// of the reference's c_curvature_grad one-ring Taubin pass,
// /root/reference/ch_shrinkwrap/membrane_mesh_utils.c:915-1250).  The
// fit driver uses it for the neck diagnostic at remesh boundaries
// (remove_necks consumes only K, pyx:1201-1219) so the CG block does
// not need the folded device curvature program — measured 4.2 MB of
// TPU executable (a ~7 s load through the remote compile service) plus
// per-block device time, vs ~40 ms/boundary here.
//
// verts: (nv,3) f32; faces: (nf,3) i32 (no padding rows);
// nbr_v: (nv,K) i32 one-ring neighbor ids, -1 padded; K_out: (nv) f32.
void gaussian_k_native(const float* verts, int nv,
                       const int32_t* faces, int nf,
                       const int32_t* nbr_v, int K,
                       float* K_out) {
    const Vec3* pos = reinterpret_cast<const Vec3*>(verts);
    // angle-weighted vertex normals (ops/normals.py::vertex_normals)
    std::vector<Vec3> vn(nv, Vec3{0.f, 0.f, 0.f});
    for (int f = 0; f < nf; ++f) {
        int a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
        Vec3 tri[3] = {pos[a], pos[b], pos[c]};
        Vec3 n = (tri[1] - tri[0]).cross(tri[2] - tri[0]);
        float nn = n.norm();
        if (nn < 1e-12f) continue;
        Vec3 fn = n * (1.f / nn);
        int vid[3] = {a, b, c};
        for (int k = 0; k < 3; ++k) {
            Vec3 e_next = tri[(k + 1) % 3] - tri[k];
            Vec3 e_prev = tri[(k + 2) % 3] - tri[k];
            float dot = e_next.dot(e_prev);
            float sin = e_next.cross(e_prev).norm();
            float ang = std::atan2(sin, dot);
            vn[vid[k]] = vn[vid[k]] + fn * ang;
        }
    }
    for (int v = 0; v < nv; ++v) {
        float nn = vn[v].norm();
        vn[v] = nn > 1e-12f ? vn[v] * (1.f / nn) : Vec3{0.f, 0.f, 0.f};
    }

    for (int v = 0; v < nv; ++v) {
        const Vec3 vi = pos[v], Nvi = vn[v];
        // Householder tangent frame (curvature.py:57-74)
        float sign = Nvi.x >= 0.f ? 1.f : -1.f;
        Vec3 u{Nvi.x + sign, Nvi.y, Nvi.z};
        float uu = u.norm2() > 1e-24f ? u.norm2() : 1.f;
        Vec3 e1{-2.f * u.x * u.y / uu, 1.f - 2.f * u.y * u.y / uu,
                -2.f * u.z * u.y / uu};
        Vec3 e2{-2.f * u.x * u.z / uu, -2.f * u.y * u.z / uu,
                1.f - 2.f * u.z * u.z / uu};

        float t1[32], t2[32], ke[32], w_r[32];
        int m = 0;
        float r_sum = 0.f;
        for (int j = 0; j < K; ++j) {
            int32_t nj = nbr_v[(int64_t)v * K + j];
            if (nj < 0) continue;
            Vec3 dv = pos[nj] - vi;
            float ld = dv.norm();
            float inv = 1.f / (ld > 1e-12f ? ld : 1e-12f);
            r_sum += inv;
            Vec3 dh = dv * inv;
            float ndotdv = Nvi.dot(dv);
            // tangent direction: -(dv - (N.dv) N), normalized
            Vec3 T = (dv - Nvi * ndotdv) * -1.f;
            float tn = T.norm();
            Vec3 Tij = tn > 1e-12f ? T * (1.f / tn) : Vec3{0.f, 0.f, 0.f};
            // chord-length normal difference (curvature.py:142-147)
            float d = Nvi.dot(dh);
            float inner = std::sqrt(std::fmax(0.f,
                              std::fmin(1.f, 1.f - d * d)));
            float ndiff = std::sqrt(std::fmax(0.f, 2.f - 2.f * inner));
            float kj = 2.f * (ndotdv > 0.f ? -1.f
                              : (ndotdv < 0.f ? 1.f : 0.f))
                       * ndiff * inv;
            t1[m] = Tij.dot(e1);
            t2[m] = Tij.dot(e2);
            ke[m] = kj;
            w_r[m] = inv;
            ++m;
        }
        if (m == 0) { K_out[v] = 0.f; continue; }

        // weighted LSQ of the second fundamental form (normal
        // equations via 3x3 adjugate, curvature.py:180-221)
        double g00 = 0, g01 = 0, g02 = 0, g11 = 0, g12 = 0, g22 = 0;
        double r0 = 0, r1 = 0, r2 = 0;
        double m00 = 0, m01 = 0, m11 = 0;
        for (int j = 0; j < m; ++j) {
            double w = w_r[j] / r_sum;
            double X0 = (double)t1[j] * t1[j];
            double X1 = 2.0 * t1[j] * t2[j];
            double X2 = (double)t2[j] * t2[j];
            double y = ke[j];
            g00 += w * X0 * X0; g01 += w * X0 * X1; g02 += w * X0 * X2;
            g11 += w * X1 * X1; g12 += w * X1 * X2; g22 += w * X2 * X2;
            r0 += w * X0 * y; r1 += w * X1 * y; r2 += w * X2 * y;
            double wk = w * y;
            m00 += wk * X0;         // wk * t1 * t1
            m01 += wk * t1[j] * t2[j];
            m11 += wk * X2;
        }
        double c00 = g11 * g22 - g12 * g12;
        double c01 = g02 * g12 - g01 * g22;
        double c02 = g01 * g12 - g02 * g11;
        double c11 = g00 * g22 - g02 * g02;
        double c12 = g01 * g02 - g00 * g12;
        double c22 = g00 * g11 - g01 * g01;
        double det = g00 * c00 + g01 * c01 + g02 * c02;
        double a, b, c;
        if (std::fabs(det) > 1e-10) {
            double invd = 1.0 / det;
            a = (c00 * r0 + c01 * r1 + c02 * r2) * invd;
            b = (c01 * r0 + c11 * r1 + c12 * r2) * invd;
            c = (c02 * r0 + c12 * r1 + c22 * r2) * invd;
        } else {
            // Taubin fallback on singular rings (curvature.py:211-219)
            double disc = std::sqrt((m00 - m11) * (m00 - m11)
                                    + 4.0 * m01 * m01);
            double l1 = 0.5 * (m00 + m11 - disc);
            double l2 = 0.5 * (m00 + m11 + disc);
            a = 3.0 * l1 - l2;
            b = 0.0;
            c = 3.0 * l2 - l1;
        }
        // K = k0 * k1 = det of the 2x2 form [[a, b], [b, c]]
        K_out[v] = (float)(a * c - b * b);
    }
}

// ---- fused stream prep for the ring-gather schedules ----
// (ops/meshdata.fit_ring_schedules).  Each replaces a chain of numpy
// allocations/copies (clip copy + care-mask alloc + block-interleave
// transpose copies) with ONE pass into caller-reused scratch buffers
// (~0.1 s/boundary of the warm e2e was these copies, 2026-08-20
// cProfile).  Semantics match the numpy formulations exactly.

// Block-interleaved k-major stream of tbl[:, :k_take] (row stride
// k_src), negatives clamped to 0, care = (entry >= 0):
//   out[(v/block)*k_take*block + k*block + v%block]
//     = max(tbl[v*k_src + k], 0)
// == ops/pallas_gather.blocked_kmajor_stream(clip(tbl[:, :k_take]),
//                                            tbl[:, :k_take] >= 0).
void kmaj_stream_clip_native(const int32_t* tbl, int64_t v_rows,
                             int32_t k_src, int32_t k_take,
                             int64_t block, int32_t* idx_out,
                             uint8_t* care_out) {
    const int64_t nb = v_rows / block;
    for (int64_t b = 0; b < nb; ++b) {
        const int32_t* src = tbl + b * block * k_src;
        int32_t* dst = idx_out + b * block * k_take;
        uint8_t* cst = care_out + b * block * k_take;
        for (int64_t k = 0; k < k_take; ++k) {
            for (int64_t v = 0; v < block; ++v) {
                int32_t x = src[v * k_src + k];
                cst[k * block + v] = (uint8_t)(x >= 0);
                dst[k * block + v] = x >= 0 ? x : 0;
            }
        }
    }
}

// Flat stream with clip + care (the fold/incidence stream):
// idx = clip(tbl, 0), care = tbl >= 0.
void flat_stream_clip_native(const int32_t* tbl, int64_t n,
                             int32_t* idx_out, uint8_t* care_out) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t x = tbl[i];
        care_out[i] = (uint8_t)(x >= 0);
        idx_out[i] = x >= 0 ? x : 0;
    }
}

// np.repeat(mask, 3) as uint8 (the faces-stream care mask).
void repeat3_mask_native(const uint8_t* mask, int64_t n, uint8_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        uint8_t m = mask[i] ? 1 : 0;
        out[3 * i] = m;
        out[3 * i + 1] = m;
        out[3 * i + 2] = m;
    }
}

// Strided column extract (the per-corner faces streams):
// out[i] = tbl[i*stride + col].
void strided_col_native(const int32_t* tbl, int64_t n, int32_t stride,
                        int32_t col, int32_t* out) {
    for (int64_t i = 0; i < n; ++i) out[i] = tbl[i * stride + col];
}

// One-ring average of per-vertex scalar data (incl. self), bit-exact
// twin of mesh.core.TriangleMesh.smooth_per_vertex_data (float64
// accumulation in neighbor-slot order, cast to f32): the boundary
// neck-K smoothing pass cost ~40 ms/boundary in numpy at 131k verts.
void smooth_vertex_data_native(const float* data, const int32_t* nbr_v,
                               int64_t nv, int32_t K, int32_t n_iter,
                               float* out) {
    std::vector<double> cur(nv), nxt(nv);
    for (int64_t v = 0; v < nv; ++v) cur[v] = (double)data[v];
    for (int32_t it = 0; it < n_iter; ++it) {
        for (int64_t v = 0; v < nv; ++v) {
            double acc = cur[v];
            int cnt = 1;
            const int32_t* row = nbr_v + v * K;
            for (int32_t k = 0; k < K; ++k) {
                int32_t nj = row[k];
                if (nj >= 0) { acc += cur[nj]; ++cnt; }
            }
            nxt[v] = acc / cnt;
        }
        cur.swap(nxt);
    }
    for (int64_t v = 0; v < nv; ++v) out[v] = (float)cur[v];
}

// Non-manifold-vertex detection: a vertex is manifold iff its incident
// faces form a single fan.  Count fans by walking h -> next(twin(h))
// orbits over outgoing halfedges (the union-find construction in
// mesh.core._has_nonmanifold_vertices, which cost ~2 s of pure-Python
// find() at 131k verts per is_manifold call in the eval harness).
// he arrays are the packed halfedge tables; n = halfedge count.
// Returns 1 if any vertex has more than one fan, else 0.
int32_t has_nonmanifold_vertices_native(const int32_t* he_src,
                                        const int32_t* he_vertex,
                                        const int32_t* he_twin,
                                        const int32_t* he_next,
                                        int64_t n, int64_t nv) {
    // fan labeling: iterate orbits of the permutation
    // p(h) = next(twin(h)) restricted to halfedges with twins; count
    // distinct orbits per source vertex.
    std::vector<int32_t> orbit(n, -1);
    int32_t n_orbits = 0;
    for (int64_t h0 = 0; h0 < n; ++h0) {
        if (orbit[h0] >= 0 || he_src[h0] < 0) continue;
        int32_t label = n_orbits++;
        int64_t h = h0;
        // forward walk
        while (h >= 0 && orbit[h] < 0) {
            orbit[h] = label;
            int32_t tw = he_twin[h];
            if (tw < 0) break;
            h = he_next[tw];
            if (h >= 0 && he_src[h] != he_src[h0]) break;  // corrupt
        }
        // backward walk (orbits may be open chains at boundaries):
        // predecessor of h is twin(prev-of-orbit); find q with
        // next(twin(q)) == h0  <=>  twin(h0 is next of) ... walk via
        // twin(h0)'s prev is not available — use twin of the edge
        // arriving at src: q = twin's candidates; instead walk using
        // the inverse permutation q = twin(prevs) is O(1) only with
        // prev: approximate by walking from h0 via twin(h0)->... the
        // packed tables carry next only, so recover prev via two
        // nexts (triangles: prev == next(next)).
        int64_t q = h0;
        while (true) {
            int32_t pv = he_next[he_next[q]];      // prev(q)
            int32_t tw = he_twin[pv];
            if (tw < 0) break;
            q = tw;
            if (orbit[q] >= 0 || he_src[q] != he_src[h0]) break;
            orbit[q] = label;
        }
    }
    // count fans and used-vertex flags
    std::vector<int32_t> first_label(nv, -1);
    std::vector<uint8_t> multi(nv, 0);
    for (int64_t h = 0; h < n; ++h) {
        int32_t s = he_src[h];
        if (s < 0 || s >= nv) continue;
        int32_t lb = orbit[h];
        if (first_label[s] < 0) first_label[s] = lb;
        else if (first_label[s] != lb) multi[s] = 1;
    }
    for (int64_t v = 0; v < nv; ++v)
        if (multi[v]) return 1;
    return 0;
}

}  // extern "C"
