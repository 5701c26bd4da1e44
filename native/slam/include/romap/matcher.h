// Descriptor matching strategies (ref src/ORBmatcher.cc behaviors, rebuilt):
// windowed brute matching for initialization, projection-guided search for
// motion-model and local-map tracking, epipolar search for triangulation.
#pragma once

#include <utility>
#include <vector>

#include "romap/frame.h"
#include "romap/map.h"

namespace romap {

constexpr int kOrbDistHigh = 100;
constexpr int kOrbDistLow = 50;

// Window search around identical image locations (for two-view init).
// Returns matches as idx2 per idx1 (-1 = none); ratio test 0.9.
int SearchForInitialization(const Frame& f1, const Frame& f2,
                            std::vector<int>* matches12,
                            float window = 100.0f);

// Project last frame's map points into the current frame with the current
// pose guess, match within a radius.
int SearchByProjectionLastFrame(Frame& cur, const Frame& last, float radius);

// Project candidate map points into the current frame, match within radius;
// fills cur.points.
int SearchByProjectionMapPoints(Frame& cur, const std::vector<MapPoint*>& pts,
                                float radius);

// Match unassociated features between two keyframes under the epipolar
// constraint of their relative pose (for triangulating new points).
int SearchForTriangulation(const KeyFrame& kf1, const KeyFrame& kf2,
                           std::vector<std::pair<int, int>>* matches);

// Project candidate map points into `kf`; a projection landing on a keypoint
// that already holds a DIFFERENT map point merges the two (the better-
// observed one survives), an unclaimed keypoint gains an observation
// (ref ORBmatcher::Fuse, driven by LocalMapping::SearchInNeighbors,
// ref src/LocalMapping.cc:515). Returns fused+added count.
int FuseByProjection(KeyFrame* kf, const std::vector<MapPoint*>& candidates,
                     float radius, Map* map);

// Brute-force descriptor match of the current frame against a keyframe's
// map points (no pose prior — relocalization / reference-keyframe fallback,
// ref ORBmatcher::SearchByBoW usage in Tracking.cc:566-623). Fills
// cur.points; returns match count.
int SearchByBruteForce(Frame& cur, const KeyFrame& kf, int max_dist = 60);

// BoW-accelerated relocalization matching (the reference's
// ORBmatcher::SearchByBoW, ref src/ORBmatcher.cc:50-147): descriptors are
// compared only within shared vocabulary words, O(shared words x bucket)
// instead of O(N x M). `cur_words`/kf.bow_words are per-descriptor word ids
// from BowVocabulary::WordsOf. Assigns kf's map points into cur.points.
int SearchByBow(Frame& cur, const std::vector<int>& cur_words,
                const KeyFrame& kf, int max_dist = 60);

}  // namespace romap
