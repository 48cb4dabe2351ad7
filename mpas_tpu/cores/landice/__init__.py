"""MPAS-Albany Land Ice equivalent core (TPU-native).

Capability parity targets (ref: src/core_landice/, SURVEY §2.4):
  time integration — forward Euler (mpas_li_time_integration_fe.F)
  velocity solvers — SIA (mpas_li_sia.F), simple/uniform
                     (mpas_li_velocity_simple.F), external FO-Stokes
                     interface (Interface_velocity_solver.cpp -> the C++
                     shim in tools/velocity_solver/)
  advection        — first-order upwind thickness/tracer transport
                     (mpas_li_advection.F FO-upwind branch)
  thermal solver   — vertical enthalpy/temperature column solve
                     (mpas_li_thermal.F)
  calving          — thickness / floatation criteria (mpas_li_calving.F)
"""
