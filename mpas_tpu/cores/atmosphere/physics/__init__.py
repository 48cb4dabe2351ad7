"""Atmosphere physics parameterizations (column schemes).

TPU-native re-design of the reference physics layer (ref: src/core_atmosphere/
physics/): column schemes are pure elementwise/lane ops batched over cells —
no (i,k,j) tiling layer is needed because JAX arrays are already (nCells, nz)
with levels riding the TPU lanes.
"""
