// Native scene generator for tpuao's validation fixtures.
//
// The reference ships a Unity test scene (SURVEY.md SS3.0 'Test scene',
// expected Assets/Test/ -- mount empty, SURVEY.md SS0) as its validation
// asset; tpuao's equivalent is an analytic sphere/plane ray-cast producing
// depth + normal buffers (tpuao/utils/fixtures.py).  This is the native
// implementation of that ray-cast for large frames (4K/8K fixture
// generation is pure per-pixel float math -- the NumPy version allocates
// n_spheres full-frame temporaries).  Exposed via ctypes
// (tpuao/utils/native.py); the NumPy version is the correctness reference
// and fallback, and the two must agree bit-for-bit (same IEEE double ops in
// the same order; verified in tests/test_native.py).
//
// Build: g++ -O3 -shared -fPIC -o libtpuao_native.so raycast.cpp

#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// depth_out: h*w doubles (normalized z_eye/far, clipped to [1e-4, 1]).
// normals_out: h*w*3 doubles in buffer view space (x=+col, y=+row,
//              z=toward camera), or nullptr to skip.
void raycast_spheres(int h, int w, double tanh_, double tanv_, double far_,
                     double plane_y, int n_spheres, const double* centers,
                     const double* radii, double* depth_out,
                     double* normals_out) {
  const double inf = std::numeric_limits<double>::infinity();
  for (int y = 0; y < h; ++y) {
    const double v = ((y + 0.5) / h * 2.0 - 1.0) * tanv_;
    for (int x = 0; x < w; ++x) {
      const double u = ((x + 0.5) / w * 2.0 - 1.0) * tanh_;
      // ground plane y = plane_y (ray dir (u, v, 1), origin 0)
      const double denom = (std::fabs(v) < 1e-6) ? 1e-6 : v;
      double t_plane = plane_y / denom;
      if (!(t_plane > 0.0)) t_plane = inf;
      double t_best = t_plane;
      int hit = std::isfinite(t_plane) ? -1 : -2;  // -1 plane, -2 sky
      const double a = u * u + v * v + 1.0;
      for (int i = 0; i < n_spheres; ++i) {
        const double cx = centers[3 * i + 0];
        const double cy = centers[3 * i + 1];
        const double cz = centers[3 * i + 2];
        const double r = radii[i];
        const double b = -2.0 * (u * cx + v * cy + cz);
        const double c0 = cx * cx + cy * cy + cz * cz - r * r;
        const double disc = b * b - 4.0 * a * c0;
        double t = inf;
        if (disc >= 0.0) {
          const double root = std::sqrt(disc >= 0.0 ? disc : 0.0);
          t = (-b - root) / (2.0 * a);
          if (!(t > 0.0)) t = inf;
        }
        if (t < t_best) {
          t_best = t;
          hit = i;
        }
      }
      const double z_eye = std::isfinite(t_best) ? t_best : far_;
      double z01 = z_eye / far_;
      if (z01 < 1e-4) z01 = 1e-4;
      if (z01 > 1.0) z01 = 1.0;
      depth_out[(int64_t)y * w + x] = z01;

      if (normals_out != nullptr) {
        double nx = 0.0, ny = 0.0, nz = 1.0;
        if (hit == -1) {
          nx = 0.0;
          ny = -1.0;
          nz = 0.0;
        } else if (hit >= 0) {
          const double cx = centers[3 * hit + 0];
          const double cy = centers[3 * hit + 1];
          const double cz = centers[3 * hit + 2];
          const double r = radii[hit];
          const double px = u * t_best, py = v * t_best, pz = t_best;
          nx = (px - cx) / r;
          ny = (py - cy) / r;
          nz = -((pz - cz) / r);  // stored z = toward camera
        }
        if (nz < 1e-3) nz = 1e-3;
        const double norm = std::sqrt(nx * nx + ny * ny + nz * nz);
        double* np = normals_out + ((int64_t)y * w + x) * 3;
        np[0] = nx / norm;
        np[1] = ny / norm;
        np[2] = nz / norm;
      }
    }
  }
}

int tpuao_native_abi_version() { return 3; }  // v3: + 3-channel 'PF' codec (fio_*2)

}  // extern "C"
