// offt-tpu native tuning engine: C ABI over the Engine class.
//
// C++ re-expression of Active Harmony's native search core
// (/root/reference/activeharmony/build: session-core.c event loop,
// strategies/{nm,pro,random,brute}.c, libvertex.c simplex geometry),
// exposed through a flat C ABI consumed from Python via ctypes
// (offt_tpu/tune/engine_cpp.py). Points are integer index vectors into
// per-dimension value grids, exactly like Active Harmony's V00..Vnn
// session variables (offt-tuning.c:779-786).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o liboffttune.so offt_tune_engine.cpp

#include "engine.hpp"

using offt_tune::Engine;

extern "C" {

void* ote_create(const char* strategy, int ndims, const int* dim_sizes,
                 unsigned seed, int simplex_size, const double* init_simplex) {
  std::vector<int> sizes(dim_sizes, dim_sizes + ndims);
  return new Engine(strategy, std::move(sizes), seed, simplex_size,
                    init_simplex);
}

int ote_generate(void* h, int* point_out) {
  return static_cast<Engine*>(h)->generate(point_out) ? 1 : 0;
}

void ote_analyze(void* h, const int* point, double perf) {
  static_cast<Engine*>(h)->analyze(point, perf);
}

void ote_rejected(void* h, const int* point) {
  static_cast<Engine*>(h)->rejected(point);
}

int ote_best(void* h, int* point_out) {
  return static_cast<Engine*>(h)->best(point_out) ? 1 : 0;
}

double ote_best_perf(void* h) { return static_cast<Engine*>(h)->best_perf(); }

int ote_converged(void* h) {
  return static_cast<Engine*>(h)->converged() ? 1 : 0;
}

void ote_destroy(void* h) { delete static_cast<Engine*>(h); }

}  // extern "C"
