#include "romap/frame.h"

namespace romap {

void Frame::AssignFeaturesToBoxes(const cv::Mat& instance_mask) {
  bbox_assignment.assign(keypoints.size(), -1);
  for (size_t i = 0; i < keypoints.size(); ++i) {
    const cv::Point2f& pt = keypoints[i].pt;
    for (size_t b = 0; b < detections.size(); ++b) {
      if (!detections[b].bbox.rect.contains(pt)) continue;
      // instance-mask gate: the pixel must belong to SOME object (nonzero)
      // when a mask is available (ref Frame::AssignFeaturesToBbox gates on
      // the instance image, src/Frame.cc:747-772)
      if (!instance_mask.empty()) {
        int x = static_cast<int>(pt.x), y = static_cast<int>(pt.y);
        if (x < 0 || y < 0 || x >= instance_mask.cols ||
            y >= instance_mask.rows)
          continue;
        if (instance_mask.at<uint8_t>(y, x) == 0) continue;
      }
      bbox_assignment[i] = static_cast<int>(b);
      break;
    }
  }
}

void Frame::AssignLinesToBoxes() {
  for (auto& det : detections) det.lines.clear();
  for (const cv::Vec4f& l : lines) {
    cv::Point2f a(l[0], l[1]), b(l[2], l[3]);
    for (auto& det : detections) {
      // shrink the box slightly so border clutter lines don't count
      // (ref AssignLinesToBbox shrinks the box, src/Frame.cc:772-805)
      cv::Rect_<float> r = det.bbox.rect;
      float sx = r.width * 0.05f, sy = r.height * 0.05f;
      cv::Rect_<float> shrunk(r.x + sx, r.y + sy, r.width - 2 * sx,
                              r.height - 2 * sy);
      if (shrunk.contains(a) && shrunk.contains(b)) {
        det.lines.push_back(l);
        break;
      }
    }
  }
}

}  // namespace romap
