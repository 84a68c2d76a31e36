// acinoset-tpu native host-side preprocessing engine.
//
// Multithreaded checkerboard corner detection for the calibration
// data-loader path: the same saddle-response -> NMS -> lattice-growth ->
// subpixel-refinement algorithm as acinoset_tpu/calib/corners.py (the
// JAX implementation remains the reference; this engine accelerates
// bulk host-side ingest of calibration footage, where per-frame latency
// matters and no TPU is involved).
//
// Pure C++17 + std::thread; no external dependencies. C ABI below for
// ctypes binding.
//
// Build: see native/Makefile (produces libacinoset_native.so).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <thread>
#include <utility>
#include <vector>

namespace {

struct Image {
  int H = 0, W = 0;
  std::vector<float> d;
  float at(int y, int x) const {
    y = std::clamp(y, 0, H - 1);
    x = std::clamp(x, 0, W - 1);
    return d[static_cast<size_t>(y) * W + x];
  }
  float &ref(int y, int x) { return d[static_cast<size_t>(y) * W + x]; }
};

std::vector<float> gauss_kernel(float sigma, int radius) {
  std::vector<float> k(2 * radius + 1);
  float s = 0.f;
  for (int i = -radius; i <= radius; ++i) {
    k[i + radius] = std::exp(-0.5f * (i / sigma) * (i / sigma));
    s += k[i + radius];
  }
  for (auto &v : k) v /= s;
  return k;
}

Image sep_conv(const Image &img, const std::vector<float> &k) {
  const int r = (static_cast<int>(k.size()) - 1) / 2;
  Image tmp{img.H, img.W, std::vector<float>(img.d.size())};
  Image out{img.H, img.W, std::vector<float>(img.d.size())};
  for (int y = 0; y < img.H; ++y)
    for (int x = 0; x < img.W; ++x) {
      float acc = 0.f;
      for (int i = -r; i <= r; ++i) acc += k[i + r] * img.at(y, x + i);
      tmp.ref(y, x) = acc;
    }
  for (int y = 0; y < img.H; ++y)
    for (int x = 0; x < img.W; ++x) {
      float acc = 0.f;
      for (int i = -r; i <= r; ++i) acc += k[i + r] * tmp.at(y + i, x);
      out.ref(y, x) = acc;
    }
  return out;
}

// -det(Hessian) of the smoothed image: positive at checkerboard saddles.
Image saddle_response(const Image &gray, float sigma) {
  Image g = sep_conv(gray, gauss_kernel(sigma, static_cast<int>(3 * sigma)));
  Image resp{gray.H, gray.W, std::vector<float>(gray.d.size(), 0.f)};
  for (int y = 0; y < g.H; ++y)
    for (int x = 0; x < g.W; ++x) {
      const float gxx = g.at(y, x + 1) - 2 * g.at(y, x) + g.at(y, x - 1);
      const float gyy = g.at(y + 1, x) - 2 * g.at(y, x) + g.at(y - 1, x);
      const float gxp = (g.at(y, x + 2) - g.at(y, x)) / 2.f;       // gx at x+1.. approximations
      const float gxm = (g.at(y, x) - g.at(y, x - 2)) / 2.f;
      (void)gxp; (void)gxm;
      const float gxy = ((g.at(y + 1, x + 1) - g.at(y + 1, x - 1)) -
                         (g.at(y - 1, x + 1) - g.at(y - 1, x - 1))) / 4.f;
      const float v = -(gxx * gyy - gxy * gxy);
      resp.ref(y, x) = v > 0.f ? v : 0.f;
    }
  return resp;
}

struct Cand {
  float x, y, score;
};

std::vector<Cand> nms_topk(const Image &resp, int nms, int topk, int border) {
  const int r = nms / 2;
  std::vector<Cand> cands;
  for (int y = border; y < resp.H - border; ++y)
    for (int x = border; x < resp.W - border; ++x) {
      const float v = resp.at(y, x);
      if (v <= 0.f) continue;
      bool peak = true;
      for (int dy = -r; dy <= r && peak; ++dy)
        for (int dx = -r; dx <= r; ++dx) {
          if (dy == 0 && dx == 0) continue;
          if (resp.at(y + dy, x + dx) > v) { peak = false; break; }
        }
      if (peak) cands.push_back({static_cast<float>(x), static_cast<float>(y), v});
    }
  std::sort(cands.begin(), cands.end(),
            [](const Cand &a, const Cand &b) { return a.score > b.score; });
  if (static_cast<int>(cands.size()) > topk) cands.resize(topk);
  return cands;
}

struct Vec2 {
  double x = 0, y = 0;
  Vec2 operator+(const Vec2 &o) const { return {x + o.x, y + o.y}; }
  Vec2 operator-(const Vec2 &o) const { return {x - o.x, y - o.y}; }
  Vec2 operator*(double s) const { return {x * s, y * s}; }
  double norm() const { return std::sqrt(x * x + y * y); }
  double dot(const Vec2 &o) const { return x * o.x + y * o.y; }
};

struct Grid {
  int h = 0, w = 0;
  std::vector<Vec2> p;  // h*w
  Vec2 &at(int i, int j) { return p[static_cast<size_t>(i) * w + j]; }
  const Vec2 &at(int i, int j) const { return p[static_cast<size_t>(i) * w + j]; }
};

double lattice_roughness(const Grid &g) {
  double worst = 0.0;
  for (int i = 1; i + 1 < g.h; ++i)
    for (int j = 0; j < g.w; ++j)
      worst = std::max(worst, (g.at(i + 1, j) - g.at(i, j) * 2.0 + g.at(i - 1, j)).norm());
  for (int i = 0; i < g.h; ++i)
    for (int j = 1; j + 1 < g.w; ++j)
      worst = std::max(worst, (g.at(i, j + 1) - g.at(i, j) * 2.0 + g.at(i, j - 1)).norm());
  return worst;
}

// Greedy lattice growth from one seed (mirrors corners.py::_grow_from_seed).
bool grow_from_seed(const std::vector<Cand> &pts, int seed, int want_h, int want_w,
                    Grid *out) {
  const int n = static_cast<int>(pts.size());
  auto P = [&](int i) { return Vec2{pts[i].x, pts[i].y}; };

  // k nearest neighbors of seed (brute force; n <= 256)
  std::vector<std::pair<double, int>> dist;
  dist.reserve(n);
  for (int i = 0; i < n; ++i) {
    if (i == seed) continue;
    dist.push_back({(P(i) - P(seed)).norm(), i});
  }
  std::sort(dist.begin(), dist.end());
  if (dist.size() < 2) return false;

  Vec2 v1 = P(dist[0].second) - P(seed);
  Vec2 v2{};
  bool got2 = false;
  for (size_t t = 1; t < std::min<size_t>(dist.size(), 8); ++t) {
    Vec2 cand = P(dist[t].second) - P(seed);
    double cosang = std::abs(cand.dot(v1)) / (cand.norm() * v1.norm() + 1e-9);
    if (cosang < 0.5 && cand.norm() < 2.0 * v1.norm()) {
      v2 = cand;
      got2 = true;
      break;
    }
  }
  if (!got2) return false;

  std::map<std::pair<int, int>, int> placed;  // cell -> candidate idx
  std::map<std::pair<int, int>, Vec2> pos;
  std::vector<char> used(n, 0);
  placed[{0, 0}] = seed;
  pos[{0, 0}] = P(seed);
  used[seed] = 1;
  std::vector<std::pair<int, int>> frontier{{0, 0}};
  const int n_need = want_h * want_w;
  const int max_cells = 4 * n_need;
  const int dirs[4][2] = {{1, 0}, {-1, 0}, {0, 1}, {0, -1}};

  size_t head = 0;
  while (head < frontier.size() && static_cast<int>(placed.size()) < max_cells) {
    auto [i, j] = frontier[head++];
    for (auto &d : dirs) {
      std::pair<int, int> nxt{i + d[0], j + d[1]};
      if (pos.count(nxt)) continue;
      // predict from second differences, else one lattice step
      std::vector<Vec2> ests;
      for (auto &dd : dirs) {
        std::pair<int, int> a{nxt.first - dd[0], nxt.second - dd[1]};
        std::pair<int, int> b{nxt.first - 2 * dd[0], nxt.second - 2 * dd[1]};
        if (pos.count(a) && pos.count(b)) ests.push_back(pos[a] * 2.0 - pos[b]);
      }
      if (ests.empty()) {
        std::pair<int, int> cur{i, j};
        if (pos.count(cur))
          ests.push_back(pos[cur] + v1 * d[0] + v2 * d[1]);
      }
      if (ests.empty()) continue;
      Vec2 est{};
      for (auto &e : ests) est = est + e;
      est = est * (1.0 / ests.size());
      // nearest candidate
      int best = -1;
      double bd = 1e18;
      for (int c = 0; c < n; ++c) {
        double dd = (P(c) - est).norm();
        if (dd < bd) { bd = dd; best = c; }
      }
      double spacing = (d[0] != 0 ? v1.norm() : v2.norm());
      auto cur = pos.find({i, j});
      if (cur != pos.end())
        spacing = std::max((est - cur->second).norm() * 0.999, 1e-3);
      if (best >= 0 && !used[best] && bd < 0.35 * spacing) {
        pos[nxt] = P(best);
        placed[nxt] = best;
        used[best] = 1;
        frontier.push_back(nxt);
      }
    }
  }
  if (static_cast<int>(placed.size()) < n_need) return false;

  int imin = 1 << 29, jmin = 1 << 29, imax = -(1 << 29), jmax = -(1 << 29);
  for (auto &kv : pos) {
    imin = std::min(imin, kv.first.first);
    imax = std::max(imax, kv.first.first);
    jmin = std::min(jmin, kv.first.second);
    jmax = std::max(jmax, kv.first.second);
  }
  struct Win { double rough; double negscore; Grid g; };
  std::vector<Win> wins;
  for (int flip = 0; flip < 2; ++flip) {
    const int hh = flip ? want_w : want_h;
    const int ww = flip ? want_h : want_w;
    for (int i0 = imin; i0 + hh - 1 <= imax; ++i0)
      for (int j0 = jmin; j0 + ww - 1 <= jmax; ++j0) {
        bool full = true;
        double score = 0.0;
        for (int a = 0; a < hh && full; ++a)
          for (int b = 0; b < ww; ++b) {
            auto it = placed.find({i0 + a, j0 + b});
            if (it == placed.end()) { full = false; break; }
            score += pts[it->second].score;
          }
        if (!full) continue;
        Grid g;
        g.h = want_h;
        g.w = want_w;
        g.p.resize(static_cast<size_t>(want_h) * want_w);
        for (int a = 0; a < hh; ++a)
          for (int b = 0; b < ww; ++b) {
            Vec2 v = pos[{i0 + a, j0 + b}];
            if (!flip) g.at(a, b) = v;
            else g.at(b, a) = v;  // transpose back
          }
        wins.push_back({lattice_roughness(g), -score, std::move(g)});
      }
  }
  if (wins.empty()) return false;
  double best_rough = 1e18;
  for (auto &w : wins) best_rough = std::min(best_rough, w.rough);
  const double lim = std::max(1.5 * best_rough, best_rough + 1.0);
  Win *pick = nullptr;
  for (auto &w : wins)
    if (w.rough <= lim && (!pick || w.negscore < pick->negscore)) pick = &w;
  *out = pick->g;
  return true;
}

// cornerSubPix-style refinement on the smoothed gradient field.
void refine_subpixel(const Image &gray, Grid *grid, int win, int iters) {
  Image g = sep_conv(gray, gauss_kernel(1.5f, 4));
  Image gx{g.H, g.W, std::vector<float>(g.d.size())};
  Image gy{g.H, g.W, std::vector<float>(g.d.size())};
  for (int y = 0; y < g.H; ++y)
    for (int x = 0; x < g.W; ++x) {
      gx.ref(y, x) = (g.at(y, x + 1) - g.at(y, x - 1)) / 2.f;
      gy.ref(y, x) = (g.at(y + 1, x) - g.at(y - 1, x)) / 2.f;
    }
  auto bilinear = [](const Image &im, double x, double y) -> double {
    x = std::clamp(x, 0.0, im.W - 1.001);
    y = std::clamp(y, 0.0, im.H - 1.001);
    const int x0 = static_cast<int>(x), y0 = static_cast<int>(y);
    const double fx = x - x0, fy = y - y0;
    return im.at(y0, x0) * (1 - fx) * (1 - fy) + im.at(y0, x0 + 1) * fx * (1 - fy) +
           im.at(y0 + 1, x0) * (1 - fx) * fy + im.at(y0 + 1, x0 + 1) * fx * fy;
  };
  for (auto &c : grid->p) {
    for (int it = 0; it < iters; ++it) {
      double a = 0, b = 0, cc = 0, bx = 0, by = 0;
      for (int dy = -win; dy <= win; ++dy)
        for (int dx = -win; dx <= win; ++dx) {
          const double wgt =
              std::exp(-0.5 * (dx * dx + dy * dy) / ((win * 0.5) * (win * 0.5)));
          const double px = c.x + dx, py = c.y + dy;
          const double vx = bilinear(gx, px, py);
          const double vy = bilinear(gy, px, py);
          a += wgt * vx * vx;
          b += wgt * vx * vy;
          cc += wgt * vy * vy;
          bx += wgt * (vx * vx * px + vx * vy * py);
          by += wgt * (vx * vy * px + vy * vy * py);
        }
      const double det = a * cc - b * b;
      if (std::abs(det) < 1e-9) break;
      const double nx = (cc * bx - b * by) / det;
      const double ny = (a * by - b * bx) / det;
      c = {nx, ny};
    }
  }
}

void canonicalize(Grid *g) {
  const int h = g->h, w = g->w;
  double d00 = g->at(0, 0).norm(), d0w = g->at(0, w - 1).norm();
  double dh0 = g->at(h - 1, 0).norm(), dhw = g->at(h - 1, w - 1).norm();
  int which = 0;
  double best = d00;
  if (d0w < best) { best = d0w; which = 1; }
  if (dh0 < best) { best = dh0; which = 2; }
  if (dhw < best) { best = dhw; which = 3; }
  Grid out = *g;
  for (int i = 0; i < h; ++i)
    for (int j = 0; j < w; ++j) {
      int si = (which == 2 || which == 3) ? h - 1 - i : i;
      int sj = (which == 1 || which == 3) ? w - 1 - j : j;
      out.at(i, j) = g->at(si, sj);
    }
  *g = out;
}

bool detect_one(const float *img, int H, int W, int board_h, int board_w,
                double *out_xy) {
  Image gray{H, W, std::vector<float>(img, img + static_cast<size_t>(H) * W)};
  Image resp = saddle_response(gray, 2.0f);
  std::vector<Cand> cands = nms_topk(resp, 9, 256, 8);
  if (static_cast<int>(cands.size()) < board_h * board_w) return false;
  Grid grid;
  bool ok = false;
  for (int seed = 0; seed < std::min<int>(40, cands.size()); ++seed)
    if (grow_from_seed(cands, seed, board_h, board_w, &grid)) { ok = true; break; }
  if (!ok) return false;
  refine_subpixel(gray, &grid, 5, 10);
  canonicalize(&grid);
  for (int i = 0; i < board_h * board_w; ++i) {
    out_xy[2 * i] = grid.p[i].x;
    out_xy[2 * i + 1] = grid.p[i].y;
  }
  return true;
}

}  // namespace

extern "C" {

// Detect a checkerboard in one grayscale float image (row-major, [0,1]).
// out_xy must hold board_h*board_w*2 doubles. Returns 1 on success.
int acinoset_detect_corners(const float *img, int H, int W, int board_h,
                            int board_w, double *out_xy) {
  return detect_one(img, H, W, board_h, board_w, out_xy) ? 1 : 0;
}

// Batch detection with a thread pool. imgs: F stacked H*W images.
// out_xy: F*board_h*board_w*2 doubles; found: F ints. Returns #found.
int acinoset_detect_corners_batch(const float *imgs, int F, int H, int W,
                                  int board_h, int board_w, double *out_xy,
                                  int *found, int n_threads) {
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next{0}, hits{0};
  auto worker = [&]() {
    const size_t stride_img = static_cast<size_t>(H) * W;
    const size_t stride_out = static_cast<size_t>(board_h) * board_w * 2;
    for (;;) {
      const int f = next.fetch_add(1);
      if (f >= F) return;
      const int ok = detect_one(imgs + f * stride_img, H, W, board_h, board_w,
                                out_xy + f * stride_out);
      found[f] = ok;
      if (ok) hits.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto &t : threads) t.join();
  return hits.load();
}

}  // extern "C"
