// Jonker-Volgenant linear assignment, C++ host-side solver.
//
// The reference depends on the third-party `lap` C++ package for its
// cost-limited assignment (SURVEY.md section 2.9).  This is this framework's
// own native implementation: a dense shortest-augmenting-path JV over a
// square matrix plus the lap-compatible cost-limit embedding for
// rectangular problems.  Used from python via ctypes (no pybind11 in the
// image) for host-side evaluation matching and as the parity oracle for the
// on-device solvers.
//
// Build: see csrc/build.sh (produces liblapjv.so).

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

// Shortest augmenting path with potentials (e-maxx formulation), 0-indexed.
// cost: n x n row-major. row2col/col2row: out, length n.
void solve_square(const double* cost, int n, int* row2col, int* col2row) {
  std::vector<double> u(n + 1, 0.0), v(n + 1, 0.0);
  // p[j] = row assigned to column j (1-based sentinel scheme)
  std::vector<int> p(n + 1, -1), way(n + 1, -1);

  for (int i = 0; i < n; ++i) {
    // virtual column n is the source holding row i
    int j0 = n;
    p[n] = i;
    std::vector<double> minv(n + 1, kInf);
    std::vector<char> used(n + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0];
      double delta = kInf;
      int j1 = -1;
      for (int j = 0; j < n; ++j) {
        if (used[j]) continue;
        double cur = cost[i0 * n + j] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= n; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != -1);
    // augment
    do {
      int j1 = way[j0];
      p[j0] = (j1 == n) ? i : p[j1];
      j0 = j1;
    } while (j0 != n);
  }

  for (int j = 0; j < n; ++j) col2row[j] = p[j];
  for (int i = 0; i < n; ++i) row2col[i] = -1;
  for (int j = 0; j < n; ++j)
    if (p[j] >= 0) row2col[p[j]] = j;
}

}  // namespace

extern "C" {

// Square LAP. Returns 0 on success.
int lapjv_square(const double* cost, int n, int* row2col, int* col2row) {
  if (n <= 0) return 1;
  solve_square(cost, n, row2col, col2row);
  return 0;
}

// Rectangular LAP with `lap.lapjv(extend_cost=True, cost_limit=L)`
// semantics: embed K x N into (K+N) square with limit/2 dummies, solve,
// report real matches only (-1 elsewhere).
int lapjv_cost_limit(const double* cost, int k, int n, double limit,
                     int* row_assign, int* col_assign) {
  if (k < 0 || n < 0) return 1;
  int s = k + n;
  if (s == 0) return 0;
  std::vector<double> ext(static_cast<size_t>(s) * s, limit / 2.0);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < k; ++j) ext[(k + i) * s + (n + j)] = 0.0;
  for (int i = 0; i < k; ++i)
    for (int j = 0; j < n; ++j) ext[i * s + j] = cost[i * n + j];

  std::vector<int> r2c(s), c2r(s);
  solve_square(ext.data(), s, r2c.data(), c2r.data());

  for (int i = 0; i < k; ++i)
    row_assign[i] = (r2c[i] >= 0 && r2c[i] < n) ? r2c[i] : -1;
  for (int j = 0; j < n; ++j)
    col_assign[j] = (c2r[j] >= 0 && c2r[j] < k) ? c2r[j] : -1;
  return 0;
}

}  // extern "C"
