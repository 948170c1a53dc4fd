// Jonker-Volgenant-style linear assignment via shortest augmenting paths.
//
// Host-side native component replacing the reference's scipy
// linear_sum_assignment call inside the per-step Hungarian matchers
// (reference testr/adet/modeling/testr/matcher.py:74,157). The matcher runs
// on every training step and at every denoising step during OCR-guided
// sampling, so it sits on the host-side hot path next to the TPU program.
//
// Solves min-cost assignment of n_cols jobs to n_rows workers (n_rows >=
// n_cols), rectangular, O(n_cols * n_rows * n_cols). Returns, for each
// column, the assigned row.
//
// Build: python -m dit4sr_tpu.native.build

#include <cfloat>
#include <cstring>
#include <vector>

extern "C" int lap_solve(const double* cost, int n_rows, int n_cols,
                         int* col_to_row) {
  if (n_rows <= 0 || n_cols <= 0 || n_rows < n_cols) return 1;

  // potentials (dual variables) and assignment state; 1-indexed sentinel at 0
  std::vector<double> u(n_cols + 1, 0.0);   // column potentials
  std::vector<double> v(n_rows + 1, 0.0);   // row potentials
  std::vector<int> match(n_rows + 1, 0);    // row -> column (1-indexed)
  std::vector<int> way(n_rows + 1, 0);

  for (int j = 1; j <= n_cols; ++j) {
    // find an augmenting path for column j (shortest-path Hungarian)
    int j0 = 0;
    match[0] = j;
    std::vector<double> minv(n_rows + 1, DBL_MAX);
    std::vector<char> used(n_rows + 1, 0);
    int i0 = 0;  // current row (0 = virtual start)
    do {
      used[i0] = 1;
      int col = match[i0];
      double delta = DBL_MAX;
      int i1 = 0;
      for (int i = 1; i <= n_rows; ++i) {
        if (used[i]) continue;
        double cur = cost[(size_t)(i - 1) * n_cols + (col - 1)] - u[col] - v[i];
        if (cur < minv[i]) {
          minv[i] = cur;
          way[i] = i0;
        }
        if (minv[i] < delta) {
          delta = minv[i];
          i1 = i;
        }
      }
      for (int i = 0; i <= n_rows; ++i) {
        if (used[i]) {
          u[match[i]] += delta;
          v[i] -= delta;
        } else {
          minv[i] -= delta;
        }
      }
      i0 = i1;
      if (i0 == 0) return 2;  // no augmenting path (shouldn't happen)
    } while (match[i0] != 0);
    // augment along the path
    do {
      int i1 = way[i0];
      match[i0] = match[i1];
      i0 = i1;
    } while (i0);
  }

  for (int i = 1; i <= n_rows; ++i) {
    if (match[i] > 0) col_to_row[match[i] - 1] = i - 1;
  }
  return 0;
}
