// BoW-lite vocabulary + keyframe database: train on clustered binary
// descriptors, verify the inverted index retrieves the keyframe whose
// descriptors share the query's clusters (the reference delegates this to
// DBoW2 + KeyFrameDatabase, ref src/KeyFrameDatabase.cc).

#include <cstdio>
#include <random>

#include "romap/bow.h"
#include "romap/map.h"

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      return 1;                                                            \
    }                                                                      \
  } while (0)

using namespace romap;

namespace {

// descriptors drawn around `n_proto` random prototypes with few bit flips —
// the structure a real scene's repeated ORB features have
struct ProtoGen {
  std::mt19937 rng{7};
  std::vector<std::array<uint8_t, 32>> protos;

  explicit ProtoGen(int n_proto) {
    std::uniform_int_distribution<int> byte(0, 255);
    protos.resize(n_proto);
    for (auto& p : protos)
      for (auto& b : p) b = static_cast<uint8_t>(byte(rng));
  }

  cv::Mat Sample(int n, int proto_lo, int proto_hi) {
    std::uniform_int_distribution<int> pick(proto_lo, proto_hi - 1);
    std::uniform_int_distribution<int> bit(0, 255);
    cv::Mat m(n, 32, CV_8U);
    for (int i = 0; i < n; ++i) {
      auto d = protos[pick(rng)];
      for (int f = 0; f < 6; ++f) {  // 6 random bit flips
        int b = bit(rng);
        d[b >> 3] ^= (1 << (b & 7));
      }
      std::memcpy(m.ptr<uint8_t>(i), d.data(), 32);
    }
    return m;
  }
};

}  // namespace

int main() {
  ProtoGen gen(120);
  BowVocabulary voc;

  // train: mixed descriptors from all prototypes
  bool trained_now = false;
  while (!voc.trained())
    trained_now = voc.TrainAccumulate(gen.Sample(1000, 0, 120));
  CHECK(trained_now);
  CHECK(voc.trained());

  // stability: same descriptor always maps to the same word, and a
  // near-duplicate (few flips) maps to the same word most of the time
  cv::Mat probe = gen.Sample(200, 0, 120);
  int same = 0;
  for (int i = 0; i < probe.rows; ++i) {
    int w1 = voc.Word(probe.ptr<uint8_t>(i));
    int w2 = voc.Word(probe.ptr<uint8_t>(i));
    CHECK(w1 == w2);
    same += (w1 == w2);
  }
  CHECK(same == probe.rows);

  // database: 10 keyframes from DISJOINT prototype ranges; a query drawn
  // from range k must rank keyframe k first
  KeyFrameDatabase db(&voc);
  std::vector<KeyFrame> kfs(10);
  for (int k = 0; k < 10; ++k) {
    kfs[k].id = k;
    kfs[k].descriptors = gen.Sample(300, k * 12, (k + 1) * 12);
    db.Add(&kfs[k]);
  }
  CHECK(db.size() == 10);
  int hits = 0;
  for (int k = 0; k < 10; ++k) {
    cv::Mat q = gen.Sample(150, k * 12, (k + 1) * 12);
    auto got = db.Query(q, 3);
    CHECK(!got.empty());
    if (got.front()->id == k) ++hits;
  }
  std::printf("bow retrieval: %d/10 top-1\n", hits);
  CHECK(hits >= 9);

  // bad keyframes disappear from results
  kfs[3].bad = true;
  auto got = db.Query(gen.Sample(150, 36, 48), 3);
  for (KeyFrame* kf : got) CHECK(kf->id != 3);

  std::printf("bow_test: ALL OK\n");
  return 0;
}
