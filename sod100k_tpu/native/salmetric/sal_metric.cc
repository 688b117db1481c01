// Native salient-object-detection metric tool.
//
// Drop-in replacement for the reference SalMetric CLI
// (/root/reference/CSNet_training/SalMetric): same invocation
// (`salmetric list_file [num_threads]`), same metric definitions (MAE over
// raw grayscale /255; precision/recall at 256 strict thresholds with GT
// binarized at >128 and EPSILON=1e-4; F-measure with beta^2=0.3 computed from
// macro-averaged P/R), same stdout contract (256 threshold lines + 7 summary
// lines) that eval drivers parse.
//
// Implementation is new and different: worker pool over std::thread, and a
// single 256-bin histogram pass per image instead of a full pixel scan per
// threshold (#(sal > th) = total - cdf[th]), which is ~100x less pixel work.
// Also exposes a C ABI (salmetric_evaluate) consumed by the Python ctypes
// binding, mirroring the reference's Cython do_evaluation entry point.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

namespace salmetric {

constexpr int kThresholds = 256;
constexpr double kEpsilon = 1e-4;
constexpr double kBeta2 = 0.3;

struct Partial {
  double mae = 0.0;
  double precision[kThresholds] = {0.0};
  double recall[kThresholds] = {0.0};
  long images = 0;
  std::vector<std::string> errors;
};

struct Report {
  double mae = 0.0;
  double precision[kThresholds];
  double recall[kThresholds];
  double fmeasure[kThresholds];
  double max_f = 0.0;
  double mean_f = 0.0;
  int argmax = 0;
  double mean_precision = 0.0;
  double mean_recall = 0.0;
  long images = 0;
};

// One image pair: accumulate MAE and per-threshold P/R into `out`.
inline bool accumulate_pair(const std::string& sal_path,
                            const std::string& gt_path, Partial* out) {
  cv::Mat sal = cv::imread(sal_path, cv::IMREAD_GRAYSCALE);
  cv::Mat gt = cv::imread(gt_path, cv::IMREAD_GRAYSCALE);
  if (sal.empty() || gt.empty()) {
    out->errors.push_back("unreadable pair: " + sal_path + " " + gt_path);
    return false;
  }
  if (sal.rows != gt.rows || sal.cols != gt.cols) {
    out->errors.push_back("size mismatch: " + sal_path);
    // reference warns but continues; we skip to avoid OOB
    return false;
  }
  const long npix = static_cast<long>(sal.rows) * sal.cols;
  long hist[kThresholds] = {0};
  long hist_fg[kThresholds] = {0};
  long abs_sum = 0;
  long fg = 0;
  for (int r = 0; r < sal.rows; ++r) {
    const uint8_t* ps = sal.ptr<uint8_t>(r);
    const uint8_t* pg = gt.ptr<uint8_t>(r);
    for (int c = 0; c < sal.cols; ++c) {
      abs_sum += std::abs(static_cast<int>(ps[c]) - static_cast<int>(pg[c]));
      ++hist[ps[c]];
      if (pg[c] > kThresholds / 2) {  // gt > 128, strict
        ++fg;
        ++hist_fg[ps[c]];
      }
    }
  }
  out->mae += static_cast<double>(abs_sum) / 255.0 / npix;

  long cdf = 0, cdf_fg = 0;
  for (int th = 0; th < kThresholds; ++th) {
    cdf += hist[th];
    cdf_fg += hist_fg[th];
    const double a_sum = static_cast<double>(npix - cdf);     // #(sal > th)
    const double ab = static_cast<double>(fg - cdf_fg);       // #(sal > th & fg)
    out->precision[th] += (ab + kEpsilon) / (a_sum + kEpsilon);
    out->recall[th] += (ab + kEpsilon) / (static_cast<double>(fg) + kEpsilon);
  }
  out->images += 1;
  return true;
}

inline Report evaluate(const std::vector<std::pair<std::string, std::string>>& pairs,
                       int num_threads) {
  num_threads = std::max(1, num_threads);
  std::vector<Partial> partials(num_threads);
  std::atomic<size_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (size_t i = next.fetch_add(1); i < pairs.size(); i = next.fetch_add(1)) {
        accumulate_pair(pairs[i].first, pairs[i].second, &partials[t]);
      }
    });
  }
  for (auto& th : pool) th.join();

  Report rep;
  // The reference divides by the number of *listed* pairs, unreadable or not.
  const double n = static_cast<double>(pairs.size());
  std::fill(std::begin(rep.precision), std::end(rep.precision), 0.0);
  std::fill(std::begin(rep.recall), std::end(rep.recall), 0.0);
  for (const Partial& p : partials) {
    for (const std::string& e : p.errors) fprintf(stderr, "%s\n", e.c_str());
    rep.mae += p.mae / n;
    rep.images += p.images;
    for (int th = 0; th < kThresholds; ++th) {
      rep.precision[th] += p.precision[th] / n;
      rep.recall[th] += p.recall[th] / n;
    }
  }
  for (int th = 0; th < kThresholds; ++th) {
    const double f = ((1 + kBeta2) * rep.precision[th] * rep.recall[th]) /
                     (kBeta2 * rep.precision[th] + rep.recall[th]);
    rep.fmeasure[th] = f;
    rep.mean_f += f;
    rep.mean_precision += rep.precision[th];
    rep.mean_recall += rep.recall[th];
    if (f > rep.max_f) {
      rep.max_f = f;
      rep.argmax = th;
    }
  }
  rep.mean_f /= kThresholds;
  rep.mean_precision /= kThresholds;
  rep.mean_recall /= kThresholds;
  return rep;
}

// Reproduce `cout << float`: 6 significant digits, shortest form.
inline std::string fmt(double v) {
  char buf[64];
  snprintf(buf, sizeof(buf), "%g", static_cast<float>(v));
  return buf;
}

inline void print_report(const Report& rep) {
  std::ostringstream os;
  for (int th = 0; th < kThresholds; ++th) {
    os << "Threshold " << th << ":\tMAE: " << fmt(rep.mae)
       << "\tPrecision: " << fmt(rep.precision[th])
       << "\tRecall: " << fmt(rep.recall[th])
       << "\tFmeasure: " << fmt(rep.fmeasure[th]) << "\n";
  }
  os << "Max_F-measre:   " << fmt(rep.max_f) << "\n";
  os << "Mean_F-measre:  " << fmt(rep.mean_f) << "\n";
  os << "Precision:      " << fmt(rep.precision[rep.argmax]) << "\n";
  os << "Recall:         " << fmt(rep.recall[rep.argmax]) << "\n";
  os << "Mean_Precision: " << fmt(rep.mean_precision) << "\n";
  os << "Mean_Recall:    " << fmt(rep.mean_recall) << "\n";
  os << "MAE:            " << fmt(rep.mae) << "\n";
  fputs(os.str().c_str(), stdout);
}

}  // namespace salmetric

extern "C" {

// C ABI for the Python binding. `out` must hold 7 + 2*256 doubles:
// [mae, max_f, mean_f, precision@argmax, recall@argmax, mean_p, mean_r,
//  precision[256], recall[256]]. Returns number of images evaluated, or -1.
int salmetric_evaluate(const char** sal_paths, const char** gt_paths, int n,
                       int num_threads, int print_stdout, double* out) {
  if (n <= 0) return -1;
  std::vector<std::pair<std::string, std::string>> pairs;
  pairs.reserve(n);
  for (int i = 0; i < n; ++i) pairs.emplace_back(sal_paths[i], gt_paths[i]);
  salmetric::Report rep = salmetric::evaluate(pairs, num_threads);
  if (print_stdout) salmetric::print_report(rep);
  if (out) {
    out[0] = rep.mae;
    out[1] = rep.max_f;
    out[2] = rep.mean_f;
    out[3] = rep.precision[rep.argmax];
    out[4] = rep.recall[rep.argmax];
    out[5] = rep.mean_precision;
    out[6] = rep.mean_recall;
    std::memcpy(out + 7, rep.precision, sizeof(rep.precision));
    std::memcpy(out + 7 + 256, rep.recall, sizeof(rep.recall));
  }
  return static_cast<int>(rep.images);
}

}  // extern "C"

#ifdef SALMETRIC_MAIN
int main(int argc, char** argv) {
  if (argc < 2 || argc > 3) {
    fprintf(stderr, "Usage: %s list_file [num_threads]\n", argv[0]);
    fprintf(stderr, "List file lines: `<sal.png> <gt.png>`\n");
    return 1;
  }
  int num_threads = (argc == 3) ? atoi(argv[2]) : 4;
  printf("%d threads are being used for accelerating.\n", num_threads);
  std::ifstream in(argv[1]);
  if (!in) {
    fprintf(stderr, "cannot open list file %s\n", argv[1]);
    return 1;
  }
  std::vector<std::pair<std::string, std::string>> pairs;
  std::string sal, gt;
  while (in >> sal >> gt) pairs.emplace_back(sal, gt);
  if (pairs.empty()) {
    fprintf(stderr, "empty list file\n");
    return 1;
  }
  salmetric::Report rep = salmetric::evaluate(pairs, num_threads);
  salmetric::print_report(rep);
  return 0;
}
#endif
