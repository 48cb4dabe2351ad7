import time, numpy as np, jax, jax.numpy as jnp
from mpas_tpu.mesh.cache import cached
from mpas_tpu.mesh.sphere import icosahedral_mesh
from mpas_tpu.mesh.reorder import sfc_reorder_mesh
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.time_integration import init_carry, run_steps

dtype = np.float32
mesh0 = cached('icos64_l4', lambda: icosahedral_mesh(64, lloyd_iters=4))
meshR, _ = sfc_reorder_mesh(mesh0)
cfg = AtmConfig(config_nvertlevels=26, config_dt=720.0, config_len_disp=120000.0)

def cast(tree):
    return jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, dtype=dtype))
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), tree)

def setup(m):
    grid, state, diag = init_jw(m, cfg, case=2)
    grid = cast(grid)
    carry = init_carry(grid, cfg, cast(state), cast(diag), cfg.config_dt)
    return grid, carry

def timed(grid, carry, n=10):
    np.asarray(run_steps(grid, cfg, carry, cfg.config_dt, n).state.u)
    t0 = time.perf_counter()
    np.asarray(run_steps(grid, cfg, carry, cfg.config_dt, n).state.u)
    return time.perf_counter() - t0

gA, cA = setup(mesh0)
gB, cB = setup(meshR)
for label, g, c in [("orig", gA, cA), ("sfc", gB, cB),
                    ("orig2", gA, cA), ("sfc2", gB, cB)]:
    t = timed(g, c)
    print(label, f"{t:.3f}s  {40962*10/t:.0f} col/s", flush=True)
