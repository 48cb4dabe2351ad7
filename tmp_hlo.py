import numpy as np, jax, jax.numpy as jnp, collections, re
from mpas_tpu.mesh.cache import cached
from mpas_tpu.mesh.sphere import icosahedral_mesh
from mpas_tpu.cores.atmosphere.config import AtmConfig
from mpas_tpu.cores.atmosphere.init_jw import init_jw
from mpas_tpu.cores.atmosphere.time_integration import init_carry, srk3_step

dtype = np.float32
mesh0 = cached('icos64_l4', lambda: icosahedral_mesh(64, lloyd_iters=4))
cfg = AtmConfig(config_nvertlevels=26, config_dt=720.0, config_len_disp=120000.0)
cast = lambda tree: jax.tree.map(
    lambda a: jnp.asarray(np.asarray(a, dtype=dtype))
    if np.issubdtype(np.asarray(a).dtype, np.floating) else jnp.asarray(a), tree)
grid, state, diag = init_jw(mesh0, cfg, case=2)
grid = cast(grid)
carry = init_carry(grid, cfg, cast(state), cast(diag), cfg.config_dt)
f = jax.jit(lambda c: srk3_step(grid, cfg, c, jnp.float32(720.0)))
comp = f.lower(carry).compile()
hlo = comp.as_text()
open('/tmp/step.hlo','w').write(hlo)
# count gathers by output shape
pat = re.compile(r'(\S+) = (\S+) gather\(')
cnt = collections.Counter()
for line in hlo.splitlines():
    m = pat.search(line)
    if m:
        cnt[m.group(2)] += 1
for shape, n in cnt.most_common(20):
    print(n, shape)
print('total gathers:', sum(cnt.values()))
print('fusions:', hlo.count(' fusion('), 'lines:', len(hlo.splitlines()))
