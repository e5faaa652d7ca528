// Native event binner: the O(events) hot loop of the cohort ETL.
//
// Reference equivalent: MIMIC-IV/cohort/build_cohort.py build_stay_matrix
// (:471-543) — per (stay, bin, variable) cell, among candidate events the
// LOWEST itemid priority wins, ties broken by LATEST charttime; afterwards
// values are forward-filled along the bin axis. The Python path
// (data/cohort.py build_stay_matrices) implements this with a
// sort+groupby-last; this kernel does it in one pass over the event stream
// with a per-cell best-key compare, plus the forward fill — no sort, no
// intermediate frames. Exposed through a plain C ABI for ctypes
// (data/native_binner.py).
#include <cstdint>
#include <cmath>
#include <limits>

extern "C" {

// x: [S*B*V] float32, initialized by this function to NaN
// m: [S*B*V] uint8 observed-mask, initialized to 0
// best_pr / best_t: scratch [S*B*V] int64 (caller-allocated, any contents)
// rows/bins/vcols/prs/ts: event attributes (already filtered to valid range)
// returns number of cells written (distinct observed cells)
int64_t bin_events(const int64_t* rows, const int64_t* bins,
                   const int64_t* vcols, const int64_t* prs,
                   const int64_t* ts, const double* vals, int64_t n_events,
                   int64_t S, int64_t B, int64_t V, float* x, uint8_t* m,
                   int64_t* best_pr, int64_t* best_t) {
  const int64_t n_cells = S * B * V;
  const float nan = std::numeric_limits<float>::quiet_NaN();
  for (int64_t i = 0; i < n_cells; ++i) {
    x[i] = nan;
    m[i] = 0;
    best_pr[i] = std::numeric_limits<int64_t>::max();
    best_t[i] = std::numeric_limits<int64_t>::min();
  }
  int64_t written = 0;
  for (int64_t e = 0; e < n_events; ++e) {
    const int64_t r = rows[e], b = bins[e], c = vcols[e];
    if (r < 0 || r >= S || b < 0 || b >= B || c < 0 || c >= V) continue;
    const int64_t cell = (r * B + b) * V + c;
    const int64_t pr = prs[e], t = ts[e];
    // lowest priority wins; among equal priority, latest charttime wins
    if (pr < best_pr[cell] || (pr == best_pr[cell] && t >= best_t[cell])) {
      if (!m[cell]) ++written;
      best_pr[cell] = pr;
      best_t[cell] = t;
      x[cell] = static_cast<float>(vals[e]);
      m[cell] = 1;
    }
  }
  return written;
}

// Forward-fill x along the bin axis (NaN cells inherit the latest earlier
// observed value of the same (stay, variable)); mask is untouched — it keeps
// marking truly observed cells only (build_cohort.py:536-543).
void forward_fill(float* x, int64_t S, int64_t B, int64_t V) {
  for (int64_t s = 0; s < S; ++s) {
    for (int64_t v = 0; v < V; ++v) {
      float last = std::numeric_limits<float>::quiet_NaN();
      for (int64_t b = 0; b < B; ++b) {
        float* cell = x + (s * B + b) * V + v;
        if (std::isnan(*cell)) {
          *cell = last;
        } else {
          last = *cell;
        }
      }
    }
  }
}

}  // extern "C"
