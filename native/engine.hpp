// offt-tpu native tuning engine (header): Engine class shared by the
// ctypes ABI (offt_tune_engine.cpp) and the native server
// (offt_tune_server.cpp). See offt_tune_engine.cpp for provenance notes.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <map>
#include <random>
#include <string>
#include <vector>

namespace offt_tune {

constexpr double kInf = std::numeric_limits<double>::infinity();

using Point = std::vector<int>;

struct Vertex {
  std::vector<double> coords;
  double perf = kInf;
};

class Engine {
 public:
  Engine(std::string strategy, std::vector<int> sizes, unsigned seed,
         int simplex_size, const double* init_simplex)
      : strategy_(std::move(strategy)),
        sizes_(std::move(sizes)),
        rng_(seed),
        n_(static_cast<int>(sizes_.size())) {
    size_ = simplex_size > 0 ? simplex_size : n_ + 1;
    if (strategy_ == "nm" || strategy_ == "pro") {
      simplex_.resize(size_);
      for (int i = 0; i < size_; ++i) {
        simplex_[i].coords.resize(n_);
        if (init_simplex) {
          for (int d = 0; d < n_; ++d)
            simplex_[i].coords[d] = init_simplex[i * n_ + d];
        } else {
          for (int d = 0; d < n_; ++d)
            simplex_[i].coords[d] = uniform_index(d);
        }
      }
      if (strategy_ == "pro") {
        cand_ = simplex_;
        pro_state_ = "measure_base";
        for (int i = 0; i < size_; ++i) queue_.push_back(i);
      }
    }
    if (strategy_ == "brute") brute_pt_.assign(n_, 0);
  }

  // ---- public ABI surface -------------------------------------------
  bool generate(int* out) {
    if (converged_) return false;
    if (strategy_ == "random") return gen_random(out);
    if (strategy_ == "brute") return gen_brute(out);
    if (strategy_ == "nm") return gen_nm(out);
    if (strategy_ == "pro") return gen_pro(out);
    return false;
  }

  void analyze(const int* pt, double perf) {
    Point p(pt, pt + n_);
    if (perf < best_perf_) {
      best_perf_ = perf;
      best_ = p;
    }
    if (strategy_ == "nm") ana_nm(p, perf);
    if (strategy_ == "pro") ana_pro(p, perf);
  }

  void rejected(const int* pt) {
    Point p(pt, pt + n_);
    if (strategy_ == "nm") {
      if (++reject_streak_ > 20) {
        converged_ = true;
        nm_pending_ = false;
        return;
      }
      if (nm_phase_init_) {
        randomize(simplex_[init_idx_].coords);
      } else {
        nm_pending_ = true;
        nm_kind_ = "retry";
        nm_coords_.resize(n_);
        randomize(nm_coords_);
      }
    } else if (strategy_ == "pro") {
      ana_pro(p, kInf);
    }
  }

  bool best(int* out) const {
    if (best_.empty()) return false;
    std::memcpy(out, best_.data(), n_ * sizeof(int));
    return true;
  }

  bool converged() const { return converged_; }
  double best_perf() const { return best_perf_; }

 private:
  // ---- helpers (libvertex.c analogues) -------------------------------
  double uniform_index(int d) {
    std::uniform_int_distribution<int> dist(0, sizes_[d] - 1);
    return static_cast<double>(dist(rng_));
  }

  void randomize(std::vector<double>& c) {
    for (int d = 0; d < n_; ++d) c[d] = uniform_index(d);
  }

  Point snap(const std::vector<double>& c) const {
    Point p(n_);
    for (int d = 0; d < n_; ++d) {
      int i = static_cast<int>(std::lround(c[d]));
      p[d] = std::max(0, std::min(sizes_[d] - 1, i));
    }
    return p;
  }

  std::vector<double> centroid(int excl_last) const {
    std::vector<double> c(n_, 0.0);
    int m = size_ - excl_last;
    for (int i = 0; i < m; ++i)
      for (int d = 0; d < n_; ++d) c[d] += simplex_[i].coords[d];
    for (double& v : c) v /= m;
    return c;
  }

  void sort_simplex(std::vector<Vertex>& s) {
    std::stable_sort(s.begin(), s.end(),
                     [](const Vertex& a, const Vertex& b) {
                       return a.perf < b.perf;
                     });
  }

  void emit(const Point& p, int* out) {
    std::memcpy(out, p.data(), n_ * sizeof(int));
  }

  // ---- random (random.c) --------------------------------------------
  bool gen_random(int* out) {
    Point p(n_);
    for (int d = 0; d < n_; ++d)
      p[d] = static_cast<int>(uniform_index(d));
    emit(p, out);
    return true;
  }

  // ---- brute (brute.c vertex_incr odometer) ---------------------------
  bool gen_brute(int* out) {
    if (brute_done_) {
      converged_ = true;
      return false;
    }
    emit(brute_pt_, out);
    int d = n_ - 1;
    while (d >= 0) {
      if (++brute_pt_[d] < sizes_[d]) break;
      brute_pt_[d--] = 0;
    }
    if (d < 0) brute_done_ = true;
    return true;
  }

  // ---- Nelder-Mead (nm.c) ---------------------------------------------
  bool gen_nm(int* out) {
    if (nm_phase_init_) {
      emit(snap(simplex_[init_idx_].coords), out);
      return true;
    }
    if (!nm_pending_) start_reflect();
    emit(snap(nm_coords_), out);
    return true;
  }

  void start_reflect() {
    sort_simplex(simplex_);
    auto cen = centroid(1);
    nm_coords_.resize(n_);
    for (int d = 0; d < n_; ++d)
      nm_coords_[d] = cen[d] + (cen[d] - simplex_.back().coords[d]);
    nm_kind_ = "reflect";
    nm_pending_ = true;
  }

  void ana_nm(const Point& p, double perf) {
    reject_streak_ = 0;
    if (nm_phase_init_) {
      auto& v = simplex_[init_idx_];
      v.perf = perf;
      for (int d = 0; d < n_; ++d) v.coords[d] = p[d];
      if (++init_idx_ >= size_) nm_phase_init_ = false;
      return;
    }
    if (!nm_pending_) return;  // stale duplicate report (multi-client):
                               // the pending trial was already consumed
    nm_pending_ = false;
    sort_simplex(simplex_);
    Vertex& worst = simplex_.back();
    const Vertex& best_v = simplex_.front();
    const Vertex& second = simplex_[size_ - 2];
    auto cen = centroid(1);
    std::vector<double> pc(p.begin(), p.end());

    if (nm_kind_ == "reflect") {
      refl_perf_ = perf;
      refl_coords_ = pc;
      if (perf < best_v.perf) {
        for (int d = 0; d < n_; ++d)
          nm_coords_[d] = cen[d] + 2.0 * (pc[d] - cen[d]);
        nm_kind_ = "expand";
        nm_pending_ = true;
      } else if (perf < second.perf) {
        worst.coords = pc;
        worst.perf = perf;
      } else {
        for (int d = 0; d < n_; ++d)
          nm_coords_[d] = cen[d] + 0.5 * (worst.coords[d] - cen[d]);
        nm_kind_ = "contract";
        nm_pending_ = true;
      }
    } else if (nm_kind_ == "expand") {
      if (perf < refl_perf_) {
        worst.coords = pc;
        worst.perf = perf;
      } else {
        worst.coords = refl_coords_;
        worst.perf = refl_perf_;
      }
    } else if (nm_kind_ == "contract") {
      if (perf < worst.perf) {
        worst.coords = pc;
        worst.perf = perf;
      } else {  // shrink toward best, re-measure all but best
        for (int i = 1; i < size_; ++i) {
          for (int d = 0; d < n_; ++d)
            simplex_[i].coords[d] =
                best_v.coords[d] + 0.5 * (simplex_[i].coords[d] - best_v.coords[d]);
          simplex_[i].perf = kInf;
        }
        nm_phase_init_ = true;
        init_idx_ = 1;
      }
    } else if (nm_kind_ == "retry") {
      worst.coords = pc;
      worst.perf = perf;
    }
    check_convergence_nm();
  }

  void check_convergence_nm() {
    if (nm_phase_init_) return;
    double mean = 0, var = 0;
    for (auto& v : simplex_) mean += v.perf;
    mean /= size_;
    for (auto& v : simplex_) var += (v.perf - mean) * (v.perf - mean);
    var /= size_;
    if (var < 1e-4 * std::max(1e-12, mean * mean)) converged_ = true;
    // collapsed simplex
    Point first = snap(simplex_[0].coords);
    bool same = true;
    for (int i = 1; i < size_ && same; ++i)
      same = (snap(simplex_[i].coords) == first);
    if (same) converged_ = true;
  }

  // ---- PRO (pro.c) -----------------------------------------------------
  bool gen_pro(int* out) {
    if (queue_.empty()) return false;
    int i = queue_.front();
    queue_.erase(queue_.begin());
    Point p = snap(cand_[i].coords);
    outstanding_[p] = i;
    emit(p, out);
    return true;
  }

  void ana_pro(const Point& p, double perf) {
    auto it = outstanding_.find(p);
    if (it == outstanding_.end()) return;
    int i = it->second;
    outstanding_.erase(it);
    for (int d = 0; d < n_; ++d) cand_[i].coords[d] = p[d];
    cand_[i].perf = perf;
    if (queue_.empty() && outstanding_.empty()) pro_transition();
  }

  std::vector<Vertex> pro_round(double coef) {
    sort_simplex(simplex_);
    const Vertex& b = simplex_.front();
    std::vector<Vertex> out;
    out.push_back(b);
    for (int i = 1; i < size_; ++i) {
      Vertex v;
      v.coords.resize(n_);
      for (int d = 0; d < n_; ++d)
        v.coords[d] = b.coords[d] + coef * (b.coords[d] - simplex_[i].coords[d]);
      out.push_back(std::move(v));
    }
    return out;
  }

  void pro_start(std::vector<Vertex> vs, std::string state) {
    cand_ = std::move(vs);
    pro_state_ = std::move(state);
    queue_.clear();
    for (int i = 0; i < size_; ++i)
      if (cand_[i].perf == kInf) queue_.push_back(i);
    if (queue_.empty()) pro_transition();
  }

  void pro_transition() {
    check_convergence_pro();
    if (converged_) return;
    auto best_of = [](const std::vector<Vertex>& vs) {
      double b = kInf;
      for (auto& v : vs) b = std::min(b, v.perf);
      return b;
    };
    if (pro_state_ == "measure_base") {
      simplex_ = cand_;
      pro_start(pro_round(1.0), "reflect");
      return;
    }
    if (pro_state_ == "reflect") {
      if (best_of(cand_) < best_of(simplex_)) {
        reflected_ = cand_;
        pro_start(pro_round(2.0), "expand");
      } else {
        sort_simplex(simplex_);
        const Vertex b = simplex_.front();
        std::vector<Vertex> shrunk;
        shrunk.push_back(b);
        for (int i = 1; i < size_; ++i) {
          Vertex v;
          v.coords.resize(n_);
          for (int d = 0; d < n_; ++d)
            v.coords[d] = b.coords[d] + 0.5 * (simplex_[i].coords[d] - b.coords[d]);
          shrunk.push_back(std::move(v));
        }
        pro_state_ = "measure_base";
        cand_ = std::move(shrunk);
        queue_.clear();
        for (int i = 1; i < size_; ++i) queue_.push_back(i);
      }
      return;
    }
    if (pro_state_ == "expand") {
      simplex_ = (best_of(cand_) < best_of(reflected_)) ? cand_ : reflected_;
      pro_start(pro_round(1.0), "reflect");
    }
  }

  void check_convergence_pro() {
    Point first = snap(cand_[0].coords);
    bool same = true;
    for (int i = 1; i < size_ && same; ++i)
      same = (snap(cand_[i].coords) == first);
    if (same) converged_ = true;
    double mean = 0, var = 0;
    int m = 0;
    for (auto& v : cand_)
      if (v.perf < kInf) {
        mean += v.perf;
        ++m;
      }
    if (m == size_) {
      mean /= m;
      for (auto& v : cand_) var += (v.perf - mean) * (v.perf - mean);
      var /= m;
      if (var < 1e-4 * std::max(1e-12, mean * mean)) converged_ = true;
    }
  }

  // ---- state ----------------------------------------------------------
  std::string strategy_;
  std::vector<int> sizes_;
  std::mt19937 rng_;
  int n_;
  int size_ = 0;
  bool converged_ = false;
  Point best_;
  double best_perf_ = kInf;

  // nm
  std::vector<Vertex> simplex_;
  bool nm_phase_init_ = true;
  int init_idx_ = 0;
  bool nm_pending_ = false;
  std::string nm_kind_;
  std::vector<double> nm_coords_;
  double refl_perf_ = kInf;
  std::vector<double> refl_coords_;
  int reject_streak_ = 0;

  // brute
  Point brute_pt_;
  bool brute_done_ = false;

  // pro
  std::vector<Vertex> cand_;
  std::vector<Vertex> reflected_;
  std::string pro_state_;
  std::vector<int> queue_;
  std::map<Point, int> outstanding_;
};

}  // namespace offt_tune

