"""MPAS-Seaice equivalent core (TPU-native).

Capability parity targets (ref: src/core_seaice/, SURVEY §2.4):
  velocity solver  — EVP elastic subcycling, weak + variational
                     discretizations (mpas_seaice_velocity_solver*.F)
  advection        — flux-form upwind transport of the ice-thickness-
                     distribution tracer hierarchy
                     (mpas_seaice_advection_upwind.F)
  column physics   — thermodynamic growth/melt, ITD category remapping,
                     ridging (column/ice_colpkg.F90 capability)
"""
