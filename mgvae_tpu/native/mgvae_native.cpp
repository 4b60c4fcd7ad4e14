// Native data-path kernels for mgvae_tpu.
//
// The reference outsources its native needs to external deps (torch_scatter,
// aigtoaig, PyMiniSolvers — SURVEY.md §2.3). Here the host-side hot loops of
// the DATA layer are C++: topological levelization (the per-circuit
// preprocessing hot loop, reference dag_utils.py:10-37) and binary-AIGER
// decoding (replacing the aigtoaig subprocess, aiger_utils.py:115-189).
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in this image).
//
// Build: see mgvae_tpu/native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// levelize: longest-path levels via Kahn propagation. Returns max level,
// or -1 if the graph has a cycle.
// ---------------------------------------------------------------------------
int64_t mg_levelize(int64_t num_nodes, int64_t num_edges,
                    const int64_t* src, const int64_t* dst,
                    int32_t* out_level) {
  std::vector<int64_t> indeg(num_nodes, 0);
  std::vector<int64_t> out_ptr(num_nodes + 1, 0);
  for (int64_t i = 0; i < num_edges; ++i) {
    indeg[dst[i]]++;
    out_ptr[src[i] + 1]++;
  }
  for (int64_t v = 0; v < num_nodes; ++v) out_ptr[v + 1] += out_ptr[v];
  std::vector<int64_t> out_adj(num_edges);
  {
    std::vector<int64_t> cursor(out_ptr.begin(), out_ptr.end() - 1);
    for (int64_t i = 0; i < num_edges; ++i) out_adj[cursor[src[i]]++] = dst[i];
  }
  std::vector<int64_t> frontier, next;
  frontier.reserve(num_nodes);
  for (int64_t v = 0; v < num_nodes; ++v) {
    out_level[v] = 0;
    if (indeg[v] == 0) frontier.push_back(v);
  }
  int64_t placed = (int64_t)frontier.size();
  int32_t level = 0;
  while (!frontier.empty()) {
    ++level;
    next.clear();
    for (int64_t u : frontier) {
      for (int64_t k = out_ptr[u]; k < out_ptr[u + 1]; ++k) {
        int64_t v = out_adj[k];
        if (--indeg[v] == 0) {
          out_level[v] = level;
          next.push_back(v);
        }
      }
    }
    placed += (int64_t)next.size();
    frontier.swap(next);
  }
  if (placed != num_nodes) return -1;  // cycle
  int32_t maxl = 0;
  for (int64_t v = 0; v < num_nodes; ++v)
    if (out_level[v] > maxl) maxl = out_level[v];
  return maxl;
}

// ---------------------------------------------------------------------------
// Binary AIGER decode (the 'aig' varint/delta format). Matches the node/edge
// construction of the reference's aig_to_xdata_bak: nodes = I PIs + A ANDs
// plus one shared NOT node per inverted variable (incl. inverted POs).
//
// gates_out capacity must be >= I + A + (2A + O) ; edges 2 cols x capacity
// >= 2A + (2A + O). Returns 0 on success, negative error codes otherwise.
// Outputs: n_nodes, n_edges written through pointers.
// ---------------------------------------------------------------------------
static inline int read_uint(const uint8_t* data, int64_t len, int64_t* pos,
                            uint64_t* out) {
  uint64_t x = 0;
  int shift = 0;
  while (*pos < len) {
    uint8_t b = data[(*pos)++];
    x |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = x;
      return 0;
    }
    shift += 7;
  }
  return -1;
}

int32_t mg_aig_decode(const uint8_t* data, int64_t len,
                      int32_t* gates_out, int64_t gates_cap,
                      int64_t* edge_src_out, int64_t* edge_dst_out,
                      int64_t edges_cap,
                      int64_t* n_nodes, int64_t* n_edges) {
  // header: "aig M I L O A\n"
  int64_t pos = 0;
  if (len < 4 || memcmp(data, "aig", 3) != 0) return -2;
  long vals[5];
  int vi = 0;
  pos = 3;
  while (vi < 5 && pos < len) {
    while (pos < len && data[pos] == ' ') ++pos;
    long v = 0;
    bool any = false;
    while (pos < len && data[pos] >= '0' && data[pos] <= '9') {
      v = v * 10 + (data[pos++] - '0');
      any = true;
    }
    if (!any) return -3;
    vals[vi++] = v;
  }
  if (vi != 5) return -3;
  while (pos < len && data[pos] != '\n') ++pos;
  ++pos;
  const int64_t I = vals[1], L = vals[2], O = vals[3], A = vals[4];
  if (L != 0) return -4;  // latches unsupported (combinational only)

  std::vector<int64_t> outputs(O);
  for (int64_t k = 0; k < O; ++k) {
    long v = 0;
    bool any = false;
    while (pos < len && data[pos] >= '0' && data[pos] <= '9') {
      v = v * 10 + (data[pos++] - '0');
      any = true;
    }
    if (!any || pos >= len || data[pos] != '\n') return -5;
    ++pos;
    outputs[k] = v;
  }

  int64_t nn = 0, ne = 0;
  if (I + A > gates_cap) return -6;
  for (int64_t k = 0; k < I; ++k) gates_out[nn++] = 0;  // PI
  for (int64_t k = 0; k < A; ++k) gates_out[nn++] = 1;  // AND

  std::vector<int64_t> has_not(I + A, -1);
  auto resolve = [&](int64_t lit) -> int64_t {
    int64_t idx = lit / 2 - 1;
    if ((lit & 1) == 0) return idx;
    if (has_not[idx] < 0) {
      if (nn >= gates_cap || ne >= edges_cap) return -1;
      gates_out[nn] = 2;  // NOT
      edge_src_out[ne] = idx;
      edge_dst_out[ne] = nn;
      has_not[idx] = nn;
      ++nn;
      ++ne;
    }
    return has_not[idx];
  };

  for (int64_t k = 0; k < A; ++k) {
    uint64_t d0, d1;
    if (read_uint(data, len, &pos, &d0) || read_uint(data, len, &pos, &d1))
      return -7;
    int64_t lhs = 2 * (I + L + k + 1);
    int64_t rhs0 = lhs - (int64_t)d0;
    int64_t rhs1 = rhs0 - (int64_t)d1;
    if (rhs0 < 0 || rhs1 < 0) return -8;
    int64_t and_idx = lhs / 2 - 1;
    int64_t f0 = resolve(rhs0);
    int64_t f1 = resolve(rhs1);
    if (f0 < 0 || f1 < 0 || ne + 2 > edges_cap) return -6;
    edge_src_out[ne] = f0;
    edge_dst_out[ne] = and_idx;
    ++ne;
    edge_src_out[ne] = f1;
    edge_dst_out[ne] = and_idx;
    ++ne;
  }
  for (int64_t k = 0; k < O; ++k) {
    if (outputs[k] & 1) {
      if (resolve(outputs[k]) < 0) return -6;
    }
  }
  *n_nodes = nn;
  *n_edges = ne;
  return 0;
}

}  // extern "C"
