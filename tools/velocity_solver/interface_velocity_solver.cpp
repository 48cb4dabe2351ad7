// Land-ice external velocity-solver interface (C ABI shared library).
//
// ref capability: src/core_landice/mode_forward/Interface_velocity_solver.cpp
// (2,290 LoC, the reference's only C++): re-mesh the MPAS Voronoi domain
// into a triangulated (Delaunay dual) + vertically extruded grid, exchange
// geometry/temperature with an external first-order Stokes solver
// (Albany/FELIX), import velocities back to MPAS edges. Same lifecycle:
//   set_grid_data -> compute_2d_grid -> set_parameters -> init_fo ->
//   solve_fo -> export_fo_velocity -> finalize
// Where the reference calls into Albany, this library carries a built-in
// first-order (SIA-limit) solve so the interface is complete and testable
// stand-alone; an external FO Stokes library can be slotted behind the
// same ABI. No MPI: domain decomposition is owned by the JAX layer, and
// the interface receives one shard's (owned+halo) mesh.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct GridData {
  int nCells = 0, nEdges = 0, nVertices = 0, vertexDegree = 0;
  std::vector<int> cellsOnVertex;   // (nVertices * vertexDegree), 0-based
  std::vector<int> cellsOnEdge;     // (nEdges * 2), 0-based
  std::vector<double> xCell, yCell, dcEdge;
  // triangulation (the Delaunay dual): one triangle per vertex with a
  // full complement of distinct cells (ref: compute_2d_grid :536)
  std::vector<int> triangles;       // (nTriangles * 3) cell indices
  std::vector<int> triangleToVertex;
  int nTriangles = 0;
  // extrusion
  std::vector<double> levelsRatio;
  int nLayers = 0;
  // parameters
  double gravity = 9.80616, rho_ice = 910.0, rho_ocean = 1028.0;
  double flow_A = 3.1709792e-24, glen_n = 3.0;
  // solution: normal velocity at edge/layer-interface
  std::vector<double> uNormal;      // (nEdges * (nLayers+1))
};

GridData g;

}  // namespace

extern "C" {

void velocity_solver_set_grid_data(
    const int* nCells, const int* nEdges, const int* nVertices,
    const int* vertexDegree, const int* cellsOnVertex,
    const int* cellsOnEdge, const double* xCell, const double* yCell,
    const double* dcEdge) {
  g.nCells = *nCells;
  g.nEdges = *nEdges;
  g.nVertices = *nVertices;
  g.vertexDegree = *vertexDegree;
  g.cellsOnVertex.assign(cellsOnVertex,
                         cellsOnVertex + g.nVertices * g.vertexDegree);
  g.cellsOnEdge.assign(cellsOnEdge, cellsOnEdge + g.nEdges * 2);
  g.xCell.assign(xCell, xCell + g.nCells);
  g.yCell.assign(yCell, yCell + g.nCells);
  g.dcEdge.assign(dcEdge, dcEdge + g.nEdges);
}

// Build the triangulation restricted to vertices whose mask is set
// (ref: velocity_solver_compute_2d_grid :536 builds the reduced
// triangulation of the dynamic-ice region). Returns nTriangles.
int velocity_solver_compute_2d_grid(const int* verticesMask) {
  g.triangles.clear();
  g.triangleToVertex.clear();
  for (int v = 0; v < g.nVertices; ++v) {
    if (!verticesMask[v]) continue;
    if (g.vertexDegree < 3) continue;
    const int c0 = g.cellsOnVertex[v * g.vertexDegree + 0];
    const int c1 = g.cellsOnVertex[v * g.vertexDegree + 1];
    const int c2 = g.cellsOnVertex[v * g.vertexDegree + 2];
    if (c0 < 0 || c1 < 0 || c2 < 0) continue;
    if (c0 == c1 || c1 == c2 || c0 == c2) continue;
    g.triangles.push_back(c0);
    g.triangles.push_back(c1);
    g.triangles.push_back(c2);
    g.triangleToVertex.push_back(v);
  }
  g.nTriangles = static_cast<int>(g.triangles.size() / 3);
  return g.nTriangles;
}

void velocity_solver_set_parameters(const double* gravity,
                                    const double* ice_density,
                                    const double* ocean_density,
                                    const double* flow_param_a,
                                    const double* glen_exponent) {
  g.gravity = *gravity;
  g.rho_ice = *ice_density;
  g.rho_ocean = *ocean_density;
  g.flow_A = *flow_param_a;
  g.glen_n = *glen_exponent;
}

// ref: velocity_solver_extrude_3d_grid :928 — record the vertical layer
// structure used by the extruded solve.
void velocity_solver_extrude_3d_grid(const int* nLayers,
                                     const double* levelsRatio) {
  g.nLayers = *nLayers;
  g.levelsRatio.assign(levelsRatio, levelsRatio + g.nLayers);
  g.uNormal.assign(static_cast<size_t>(g.nEdges) * (g.nLayers + 1), 0.0);
}

void velocity_solver_init_fo() { /* built-in solver needs no warm state */ }

// ref: velocity_solver_solve_fo :341. Inputs are MPAS cell fields; the
// built-in solve is the first-order (SIA-limit) balance evaluated on the
// triangulated grid's edges:
//   u(s) = -2 A (rho g)^n |grad s|^(n-1) ds/dn * (H^(n+1) - (s-z)^(n+1))/(n+1)
void velocity_solver_solve_fo(const double* thickness,
                              const double* bedTopography) {
  const double n = g.glen_n;
  const double rg = g.rho_ice * g.gravity;
  const double coef = 2.0 * g.flow_A * std::pow(rg, n) / (n + 1.0);

  for (int e = 0; e < g.nEdges; ++e) {
    const int c1 = g.cellsOnEdge[e * 2 + 0];
    const int c2 = g.cellsOnEdge[e * 2 + 1];
    if (c1 < 0 || c2 < 0 || c1 == c2) {
      for (int k = 0; k <= g.nLayers; ++k)
        g.uNormal[static_cast<size_t>(e) * (g.nLayers + 1) + k] = 0.0;
      continue;
    }
    const double h1 = thickness[c1], h2 = thickness[c2];
    const double s1 = bedTopography[c1] + h1;
    const double s2 = bedTopography[c2] + h2;
    const double dc = g.dcEdge[e] > 0.0 ? g.dcEdge[e] : 1.0;
    const double dsdn = (s2 - s1) / dc;
    const double h = 0.5 * (h1 + h2);
    if (h1 <= 1.0 && h2 <= 1.0) {
      for (int k = 0; k <= g.nLayers; ++k)
        g.uNormal[static_cast<size_t>(e) * (g.nLayers + 1) + k] = 0.0;
      continue;
    }
    const double slope = std::fabs(dsdn);
    const double base = -coef * std::pow(slope, n - 1.0) * dsdn;
    // interface k at depth fraction sigma_k below the surface
    double sigma = 0.0;
    for (int k = 0; k <= g.nLayers; ++k) {
      const double depth = sigma * h;
      const double prof = std::pow(h, n + 1.0) - std::pow(depth, n + 1.0);
      g.uNormal[static_cast<size_t>(e) * (g.nLayers + 1) + k] = base * prof;
      if (k < g.nLayers) sigma += g.levelsRatio[k];
    }
  }
}

// ref: velocity_solver_export_fo_velocity :124 — copy the solution back
// into the caller's edge/layer array.
void velocity_solver_export_fo_velocity(double* uNormal_out) {
  for (size_t i = 0; i < g.uNormal.size(); ++i)
    uNormal_out[i] = g.uNormal[i];
}

int velocity_solver_get_n_triangles() { return g.nTriangles; }

void velocity_solver_get_triangles(int* tri_out, int* tri_vertex_out) {
  for (size_t i = 0; i < g.triangles.size(); ++i) tri_out[i] = g.triangles[i];
  for (int t = 0; t < g.nTriangles; ++t)
    tri_vertex_out[t] = g.triangleToVertex[t];
}

void velocity_solver_finalize() { g = GridData(); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Full first-order (Blatter-Pattyn) Stokes solve, native.
//
// The same discretization as the JAX solver (mpas_tpu/cores/landice/
// fo_stokes.py, which see for the math; ref capability:
// Interface_velocity_solver.cpp velocity_solver_solve_fo :341 delegating
// to Albany/FELIX): per-cell least-squares horizontal gradients over the
// edge-neighbor set, adjoint-consistent membrane-stress divergence,
// vertical viscosity with basal friction, Picard on the Glen viscosity,
// matrix-free conjugate gradients on the coupled (u, v) system. Planar
// coordinates (no periodic wrap — callers pass a halo'd local shard or a
// bounded domain).
// ---------------------------------------------------------------------------

namespace fo {

constexpr double EPS_REG = 1e-22;  // strain-rate regularization (1/s)^2

struct Workspace {
  // neighbor adjacency from cellsOnEdge + LSQ gradient weights
  std::vector<std::vector<int>> nbr;         // per cell
  std::vector<std::vector<double>> wx, wy;   // per-neighbor weights
  std::vector<double> w0x, w0y;              // self weights
  std::vector<double> area;
  double beta2 = 1.0e12;
  int picard = 10, cg = 120;
  bool built = false;
};

Workspace w;

void build_adjacency(const double* areaCell) {
  const int nC = g.nCells;
  w.nbr.assign(nC, {});
  for (int e = 0; e < g.nEdges; ++e) {
    const int c1 = g.cellsOnEdge[e * 2 + 0];
    const int c2 = g.cellsOnEdge[e * 2 + 1];
    if (c1 < 0 || c2 < 0 || c1 == c2) continue;
    w.nbr[c1].push_back(c2);
    w.nbr[c2].push_back(c1);
  }
  w.wx.assign(nC, {});
  w.wy.assign(nC, {});
  w.w0x.assign(nC, 0.0);
  w.w0y.assign(nC, 0.0);
  for (int c = 0; c < nC; ++c) {
    double a11 = 0.0, a12 = 0.0, a22 = 0.0;
    const size_t m = w.nbr[c].size();
    std::vector<double> dx(m), dy(m);
    for (size_t j = 0; j < m; ++j) {
      dx[j] = g.xCell[w.nbr[c][j]] - g.xCell[c];
      dy[j] = g.yCell[w.nbr[c][j]] - g.yCell[c];
      a11 += dx[j] * dx[j];
      a12 += dx[j] * dy[j];
      a22 += dy[j] * dy[j];
    }
    const double det = std::max(a11 * a22 - a12 * a12, 1e-30);
    w.wx[c].resize(m);
    w.wy[c].resize(m);
    double sx = 0.0, sy = 0.0;
    for (size_t j = 0; j < m; ++j) {
      w.wx[c][j] = (a22 * dx[j] - a12 * dy[j]) / det;
      w.wy[c][j] = (a11 * dy[j] - a12 * dx[j]) / det;
      sx += w.wx[c][j];
      sy += w.wy[c][j];
    }
    w.w0x[c] = -sx;
    w.w0y[c] = -sy;
  }
  w.area.assign(areaCell, areaCell + nC);
  for (auto& a : w.area) a = std::max(a, 1e-30);
  w.built = true;
}

using Field = std::vector<double>;   // (nC * nL), layer-inner

inline void hgrad(const Field& f, Field& fx, Field& fy, int nL) {
  const int nC = g.nCells;
  for (int c = 0; c < nC; ++c) {
    for (int k = 0; k < nL; ++k) {
      double gx = w.w0x[c] * f[c * nL + k];
      double gy = w.w0y[c] * f[c * nL + k];
      for (size_t j = 0; j < w.nbr[c].size(); ++j) {
        gx += w.wx[c][j] * f[w.nbr[c][j] * nL + k];
        gy += w.wy[c][j] * f[w.nbr[c][j] * nL + k];
      }
      fx[c * nL + k] = gx;
      fy[c * nL + k] = gy;
    }
  }
}

// exact area-weighted adjoint of hgrad (keeps the operator symmetric)
inline void hdiv(const Field& fx, const Field& fy, Field& out, int nL) {
  const int nC = g.nCells;
  std::fill(out.begin(), out.end(), 0.0);
  for (int c = 0; c < nC; ++c) {
    const double a = w.area[c];
    for (int k = 0; k < nL; ++k) {
      out[c * nL + k] += (w.w0x[c] * fx[c * nL + k]
                          + w.w0y[c] * fy[c * nL + k]) * a;
      for (size_t j = 0; j < w.nbr[c].size(); ++j)
        out[w.nbr[c][j] * nL + k] += (w.wx[c][j] * fx[c * nL + k]
                                      + w.wy[c][j] * fy[c * nL + k]) * a;
    }
  }
  for (int c = 0; c < nC; ++c)
    for (int k = 0; k < nL; ++k) out[c * nL + k] /= w.area[c];
}

inline void vert_apply(const Field& f, const Field& nu, const Field& dz,
                       Field& out, int nL) {
  const int nC = g.nCells;
  for (int c = 0; c < nC; ++c) {
    const double* fc = &f[c * nL];
    const double* nuc = &nu[c * nL];
    const double* dzc = &dz[c * nL];
    // interface fluxes (stress); 0 at top and bottom, basal drag added
    for (int k = 0; k < nL; ++k) {
      double fl_lo = 0.0, fl_hi = 0.0;
      if (k > 0) {
        const double nui = 0.5 * (nuc[k] + nuc[k - 1]);
        const double dzi = 0.5 * (dzc[k] + dzc[k - 1]);
        fl_lo = nui * (fc[k] - fc[k - 1]) / dzi;
      }
      if (k < nL - 1) {
        const double nui = 0.5 * (nuc[k + 1] + nuc[k]);
        const double dzi = 0.5 * (dzc[k + 1] + dzc[k]);
        fl_hi = nui * (fc[k + 1] - fc[k]) / dzi;
      }
      double val = -(fl_hi - fl_lo) / dzc[k];
      if (k == nL - 1) val += w.beta2 * fc[k] / dzc[k];
      out[c * nL + k] = val;
    }
  }
}

inline void dz_center(const Field& f, const Field& dz, Field& out, int nL) {
  const int nC = g.nCells;
  for (int c = 0; c < nC; ++c) {
    const double* fc = &f[c * nL];
    const double* dzc = &dz[c * nL];
    for (int k = 0; k < nL; ++k) {
      double v;
      if (k == 0)
        v = (fc[1] - fc[0]) / (0.5 * (dzc[0] + dzc[1]));
      else if (k == nL - 1)
        v = (fc[nL - 1] - fc[nL - 2])
            / (0.5 * (dzc[nL - 1] + dzc[nL - 2]));
      else
        v = (fc[k + 1] - fc[k - 1]) * 2.0
            / (dzc[k + 1] + 2.0 * dzc[k] + dzc[k - 1]);
      out[c * nL + k] = v;
    }
  }
}

struct Op {
  // frozen viscosity operator state
  Field nu, dz;
  int nL;
  Field fxu, fyu, fxv, fyv, sux, suy, svx, svy, tmp;

  void apply(const Field& u, const Field& v, Field& lu, Field& lv) {
    hgrad(u, fxu, fyu, nL);
    hgrad(v, fxv, fyv, nL);
    const size_t n = u.size();
    for (size_t i = 0; i < n; ++i) {
      sux[i] = nu[i] * (4.0 * fxu[i] + 2.0 * fyv[i]);
      suy[i] = nu[i] * (fyu[i] + fxv[i]);
      svx[i] = nu[i] * (fyu[i] + fxv[i]);
      svy[i] = nu[i] * (4.0 * fyv[i] + 2.0 * fxu[i]);
    }
    hdiv(sux, suy, lu, nL);
    vert_apply(u, nu, dz, tmp, nL);
    for (size_t i = 0; i < n; ++i) lu[i] += tmp[i];
    hdiv(svx, svy, lv, nL);
    vert_apply(v, nu, dz, tmp, nL);
    for (size_t i = 0; i < n; ++i) lv[i] += tmp[i];
  }
};

inline double dot2(const Field& au, const Field& av, const Field& bu,
                   const Field& bv) {
  double s = 0.0;
  for (size_t i = 0; i < au.size(); ++i) s += au[i] * bu[i] + av[i] * bv[i];
  return s;
}

}  // namespace fo

extern "C" {

void velocity_solver_set_fo_options(const double* beta2,
                                    const int* picard_iters,
                                    const int* cg_iters) {
  fo::w.beta2 = *beta2;
  fo::w.picard = *picard_iters;
  fo::w.cg = *cg_iters;
}

void velocity_solver_set_cell_areas(const double* areaCell) {
  fo::build_adjacency(areaCell);
}

// Full FO Stokes solve (Picard + CG), result exported through the usual
// velocity_solver_export_fo_velocity as edge-normal interface velocities.
void velocity_solver_solve_fo_stokes(const double* thickness,
                                     const double* bedTopography) {
  const int nC = g.nCells, nL = g.nLayers;
  const double n = g.glen_n;
  const double rho_g = g.rho_ice * g.gravity;

  fo::Field h(nC), dz(static_cast<size_t>(nC) * nL);
  fo::Field surf1(nC);   // single-layer field for the surface gradient
  for (int c = 0; c < nC; ++c) {
    h[c] = std::max(thickness[c], 1.0);
    surf1[c] = bedTopography[c] + thickness[c];
    for (int k = 0; k < nL; ++k) dz[c * nL + k] = h[c] / nL;
  }
  fo::Field sx(nC), sy(nC);
  fo::hgrad(surf1, sx, sy, 1);

  const size_t N = static_cast<size_t>(nC) * nL;
  fo::Field bu(N), bv(N), u(N, 0.0), v(N, 0.0);
  for (int c = 0; c < nC; ++c)
    for (int k = 0; k < nL; ++k) {
      bu[c * nL + k] = -rho_g * sx[c];
      bv[c * nL + k] = -rho_g * sy[c];
    }

  fo::Op op;
  op.nL = nL;
  op.dz = dz;
  op.nu.assign(N, 0.0);
  for (auto* f : {&op.fxu, &op.fyu, &op.fxv, &op.fyv, &op.sux, &op.suy,
                  &op.svx, &op.svy, &op.tmp})
    f->assign(N, 0.0);

  fo::Field uz(N), vz(N), lu(N), lv(N), ru(N), rv(N), pu(N), pv(N),
      apu(N), apv(N);

  for (int it = 0; it < fo::w.picard; ++it) {
    // Glen viscosity at the current iterate
    fo::hgrad(u, op.fxu, op.fyu, nL);
    fo::hgrad(v, op.fxv, op.fyv, nL);
    fo::dz_center(u, dz, uz, nL);
    fo::dz_center(v, dz, vz, nL);
    for (size_t i = 0; i < N; ++i) {
      const double ux = op.fxu[i], uy = op.fyu[i];
      const double vx = op.fxv[i], vy = op.fyv[i];
      double e2 = ux * ux + vy * vy + ux * vy
          + 0.25 * (uy + vx) * (uy + vx)
          + 0.25 * uz[i] * uz[i] + 0.25 * vz[i] * vz[i] + fo::EPS_REG;
      op.nu[i] = 0.5 * std::pow(g.flow_A, -1.0 / n)
          * std::pow(e2, (1.0 - n) / (2.0 * n));
    }
    // CG on the frozen-viscosity system
    op.apply(u, v, lu, lv);
    for (size_t i = 0; i < N; ++i) {
      ru[i] = bu[i] - lu[i];
      rv[i] = bv[i] - lv[i];
      pu[i] = ru[i];
      pv[i] = rv[i];
    }
    double rs = fo::dot2(ru, rv, ru, rv);
    for (int cgit = 0; cgit < fo::w.cg; ++cgit) {
      op.apply(pu, pv, apu, apv);
      const double denom = fo::dot2(pu, pv, apu, apv);
      const double alpha = rs / std::max(denom, 1e-300);
      for (size_t i = 0; i < N; ++i) {
        u[i] += alpha * pu[i];
        v[i] += alpha * pv[i];
        ru[i] -= alpha * apu[i];
        rv[i] -= alpha * apv[i];
      }
      const double rs_new = fo::dot2(ru, rv, ru, rv);
      const double beta = rs_new / std::max(rs, 1e-300);
      for (size_t i = 0; i < N; ++i) {
        pu[i] = ru[i] + beta * pu[i];
        pv[i] = rv[i] + beta * pv[i];
      }
      rs = rs_new;
    }
  }

  // project to edge-normal interface velocities (the export contract of
  // velocity_solver_solve_fo): dynamic-ice mask, cell-pair average onto
  // the c1->c2 normal, midpoints -> interfaces
  g.uNormal.assign(static_cast<size_t>(g.nEdges) * (nL + 1), 0.0);
  for (int e = 0; e < g.nEdges; ++e) {
    const int c1 = g.cellsOnEdge[e * 2 + 0];
    const int c2 = g.cellsOnEdge[e * 2 + 1];
    if (c1 < 0 || c2 < 0 || c1 == c2) continue;
    const double d1 = thickness[c1] > 1.0 ? 1.0 : 0.0;
    const double d2 = thickness[c2] > 1.0 ? 1.0 : 0.0;
    const double dxe = g.xCell[c2] - g.xCell[c1];
    const double dye = g.yCell[c2] - g.yCell[c1];
    const double dc = std::max(std::hypot(dxe, dye), 1e-30);
    const double nx = dxe / dc, ny = dye / dc;
    std::vector<double> un_mid(nL);
    for (int k = 0; k < nL; ++k) {
      const double uu = 0.5 * (u[c1 * nL + k] * d1 + u[c2 * nL + k] * d2);
      const double vv = 0.5 * (v[c1 * nL + k] * d1 + v[c2 * nL + k] * d2);
      un_mid[k] = uu * nx + vv * ny;
    }
    double* out = &g.uNormal[static_cast<size_t>(e) * (nL + 1)];
    out[0] = un_mid[0];
    for (int k = 1; k < nL; ++k)
      out[k] = 0.5 * (un_mid[k - 1] + un_mid[k]);
    out[nL] = un_mid[nL - 1];
  }
}

}  // extern "C"
