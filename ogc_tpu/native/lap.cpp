// Linear assignment (Jonker-Volgenant shortest augmenting path) — native
// host-side solver for the evaluation pipeline's per-scene Hungarian
// matching (the in-graph jittable solver in ogc_tpu/utils/lap.py covers the
// training path; this covers host metrics at batch scale without scipy).
//
// Algorithm identical to the reference's scipy dependency
// (scipy rectangular_lsap): per row, Dijkstra over reduced costs until an
// unassigned column is reached, then dual updates and path augmentation.

#include <cfloat>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Solve one KxK minimization; writes col4row[K].
void solve_one(const float* cost, int k, int32_t* col4row) {
  std::vector<double> u(k, 0.0), v(k, 0.0), shortest(k);
  std::vector<int32_t> row4col(k, -1), pred(k, 0);
  std::vector<char> done(k), sr(k);
  std::vector<int32_t> c4r(k, -1);

  for (int cur_row = 0; cur_row < k; ++cur_row) {
    std::fill(shortest.begin(), shortest.end(), DBL_MAX);
    std::fill(done.begin(), done.end(), 0);
    std::fill(sr.begin(), sr.end(), 0);
    double min_val = 0.0;
    int i = cur_row;
    int sink = -1;
    while (sink < 0) {
      sr[i] = 1;
      int j_min = -1;
      double lowest = DBL_MAX;
      for (int j = 0; j < k; ++j) {
        if (done[j]) continue;
        double r = min_val + (double)cost[i * k + j] - u[i] - v[j];
        if (r < shortest[j]) {
          shortest[j] = r;
          pred[j] = i;
        }
        if (shortest[j] < lowest ||
            (shortest[j] == lowest && row4col[j] < 0)) {
          lowest = shortest[j];
          j_min = j;
        }
      }
      min_val = lowest;
      done[j_min] = 1;
      if (row4col[j_min] < 0) {
        sink = j_min;
      } else {
        i = row4col[j_min];
      }
    }
    u[cur_row] += min_val;
    for (int r = 0; r < k; ++r) {
      if (sr[r] && r != cur_row) u[r] += min_val - shortest[c4r[r]];
    }
    for (int j = 0; j < k; ++j) {
      if (done[j]) v[j] -= min_val - shortest[j];
    }
    int j = sink;
    while (true) {
      int r = pred[j];
      row4col[j] = r;
      int tmp = c4r[r];
      c4r[r] = j;
      j = tmp;
      if (r == cur_row) break;
    }
  }
  std::memcpy(col4row, c4r.data(), k * sizeof(int32_t));
}

}  // namespace

extern "C" {

// Batched LAP: cost (b, k, k) row-major float32 -> col_ind (b, k) int32.
// maximize != 0 flips the objective.  Uses up to n_threads host threads.
void lap_solve_batch(const float* cost, int b, int k, int maximize,
                     int n_threads, int32_t* col_ind) {
  std::vector<float> neg;
  const float* src = cost;
  if (maximize) {
    neg.resize((size_t)b * k * k);
    for (size_t i = 0; i < neg.size(); ++i) neg[i] = -cost[i];
    src = neg.data();
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > b) n_threads = b;
  std::vector<std::thread> pool;
  std::vector<int> starts(n_threads + 1);
  for (int t = 0; t <= n_threads; ++t) starts[t] = (int)((int64_t)b * t / n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int s = starts[t]; s < starts[t + 1]; ++s) {
        solve_one(src + (size_t)s * k * k, k, col_ind + (size_t)s * k);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
