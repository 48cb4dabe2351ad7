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
