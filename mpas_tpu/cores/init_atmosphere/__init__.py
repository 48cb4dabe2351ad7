"""init_atmosphere core equivalent: IC preprocessing toolchain.

ref: src/core_init_atmosphere/ (SURVEY §2.4): idealized cases live with
the atmosphere core (init_jw, init_supercell); this package carries the
real-data preprocessing machinery: map projections (mpas_init_atm_llxy.F),
horizontal interpolation (mpas_init_atm_hinterp.F), vertical interpolation
(mpas_init_atm_vinterp.F), and static/terrain field interpolation from
geogrid tiles (mpas_init_atm_static.F + read_geogrid.c -> the C++ reader
in tools/geogrid/).
"""
