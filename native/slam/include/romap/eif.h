// Extended Isolation Forest (Hariri, Kind, Brunner, IEEE TKDE 2019):
// isolation trees whose splits are random hyperplanes (normal ~ N(0,1)^d,
// offset uniform over the projected data range); anomaly score
// s = 2^(-E[path length] / c(n)). The reference uses a 40-tree EIF over the
// object's MapPoint cloud to drop outlier points (ref include/EIF.h,
// src/ObjectMap.cc:98-186). Own implementation, iterative partition-based.
#pragma once

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <memory>
#include <random>
#include <vector>

namespace romap {

template <int Dim>
class ExtendedIsolationForest {
 public:
  using Point = std::array<float, Dim>;

  // c(n): average unsuccessful-search path length in a BST of n nodes.
  static double PathNorm(uint32_t n) {
    if (n <= 1) return 0.0;
    if (n == 2) return 1.0;
    double h = std::log(static_cast<double>(n - 1)) + 0.5772156649015329;
    return 2.0 * h - 2.0 * (n - 1.0) / n;
  }

  void Build(const std::vector<Point>& data, int n_trees, uint32_t seed,
             uint32_t sample_size = 0) {
    trees_.clear();
    if (data.empty()) return;
    if (sample_size == 0 || sample_size > data.size())
      sample_size = static_cast<uint32_t>(data.size());
    sample_size_ = sample_size;
    max_depth_ = static_cast<uint32_t>(
        std::ceil(std::log2(static_cast<double>(sample_size))));
    std::mt19937 rng(seed);
    trees_.reserve(n_trees);
    for (int i = 0; i < n_trees; ++i) {
      // subsample without replacement
      std::vector<const Point*> sample;
      sample.reserve(sample_size);
      if (sample_size == data.size()) {
        for (const auto& p : data) sample.push_back(&p);
      } else {
        std::vector<uint32_t> idx(data.size());
        for (uint32_t k = 0; k < idx.size(); ++k) idx[k] = k;
        std::shuffle(idx.begin(), idx.end(), rng);
        for (uint32_t k = 0; k < sample_size; ++k)
          sample.push_back(&data[idx[k]]);
      }
      trees_.emplace_back();
      BuildNode(trees_.back(), rng, sample, 0, sample.size(), 0);
    }
  }

  double AnomalyScore(const Point& p) const {
    if (trees_.empty()) return 0.0;
    double total = 0.0;
    for (const auto& tree : trees_) total += PathLen(tree, 0, p, 0);
    double avg = total / trees_.size();
    return std::pow(2.0, -avg / PathNorm(sample_size_));
  }

  void AnomalyScores(const std::vector<Point>& data,
                     std::vector<double>* out) const {
    out->resize(data.size());
    for (size_t i = 0; i < data.size(); ++i) (*out)[i] = AnomalyScore(data[i]);
  }

 private:
  struct Node {
    std::array<double, Dim> normal{};
    double offset = 0;
    int32_t left = -1, right = -1;  // indices into the tree vector
    uint32_t leaf_size = 0;         // >0 marks a leaf
  };
  using Tree = std::vector<Node>;

  static double Dot(const std::array<double, Dim>& n, const Point& p) {
    double s = 0;
    for (int i = 0; i < Dim; ++i) s += n[i] * p[i];
    return s;
  }

  int32_t BuildNode(Tree& tree, std::mt19937& rng,
                    std::vector<const Point*>& pts, size_t first, size_t last,
                    uint32_t depth) {
    int32_t id = static_cast<int32_t>(tree.size());
    tree.emplace_back();
    size_t n = last - first;
    if (n <= 1 || depth >= max_depth_) {
      tree[id].leaf_size = static_cast<uint32_t>(n);
      return id;
    }
    std::array<double, Dim> normal;
    std::normal_distribution<double> gauss(0.0, 1.0);
    for (int i = 0; i < Dim; ++i) normal[i] = gauss(rng);

    double lo = Dot(normal, *pts[first]), hi = lo;
    for (size_t k = first + 1; k < last; ++k) {
      double v = Dot(normal, *pts[k]);
      lo = std::min(lo, v);
      hi = std::max(hi, v);
    }
    if (lo == hi) {
      tree[id].leaf_size = static_cast<uint32_t>(n);
      return id;
    }
    std::uniform_real_distribution<double> offs(lo, hi);
    double split = offs(rng);

    auto mid = std::partition(
        pts.begin() + first, pts.begin() + last,
        [&](const Point* p) { return Dot(normal, *p) < split; });
    size_t m = static_cast<size_t>(mid - pts.begin());
    if (m == first || m == last) {
      tree[id].leaf_size = static_cast<uint32_t>(n);
      return id;
    }
    tree[id].normal = normal;
    tree[id].offset = split;
    int32_t l = BuildNode(tree, rng, pts, first, m, depth + 1);
    int32_t r = BuildNode(tree, rng, pts, m, last, depth + 1);
    tree[id].left = l;
    tree[id].right = r;
    return id;
  }

  double PathLen(const Tree& tree, int32_t id, const Point& p,
                 uint32_t depth) const {
    const Node& node = tree[id];
    if (node.left < 0)  // leaf
      return depth + PathNorm(node.leaf_size);
    if (Dot(node.normal, p) < node.offset)
      return PathLen(tree, node.left, p, depth + 1);
    return PathLen(tree, node.right, p, depth + 1);
  }

  std::vector<Tree> trees_;
  uint32_t sample_size_ = 0;
  uint32_t max_depth_ = 0;
};

}  // namespace romap
