"""Per-phase, per-pair timing of the batched serving path at B in {1,2,4,8}.

Tunnel-safe: per-iteration tiny host fetch (the remote runtime's sync is
lazy and its dispatch queue absorbs short loops) minus the measured fetch
roundtrip.
"""
import time, numpy as np, jax, jax.numpy as jnp
from gfnet_tpu.config import ModelConfig
from gfnet_tpu.matcher.api import GFNetMatcher

cfg = ModelConfig()
m = GFNetMatcher(cfg)
rng = np.random.default_rng(0)
ITERS = 8

triv = jax.jit(lambda x, i: x.sum() + i)
xt = jnp.ones((8, 128)); np.asarray(triv(xt, 0))
t0 = time.perf_counter()
for i in range(20): np.asarray(triv(xt, i))
RT = (time.perf_counter() - t0) / 20
print(f"fetch roundtrip {RT*1e3:.1f} ms")

def timeit(fn, pick):
    np.asarray(pick(fn(0)))
    t0 = time.perf_counter()
    for i in range(ITERS):
        np.asarray(pick(fn(i)))
    return max((time.perf_counter() - t0) / ITERS - RT, 0.0)

for b in (1, 2, 4, 8):
    base = rng.uniform(0, 1, (b, 448, 448, 3)).astype(np.float32)
    var_a = [jnp.asarray((base + 1e-4 * j).clip(0, 1)) for j in range(ITERS)]
    bb = jnp.asarray(rng.uniform(0, 1, (b, 448, 448, 3)).astype(np.float32))
    hv, vp = m.head_vars, m.vit_params
    p1 = m._pass1_jit(hv, vp, var_a[0], bb)
    warp, cert = m._pass2_jit(hv, vp, var_a[0], bb, *p1)
    hw = (448, 448)
    t1 = timeit(lambda i: m._pass1_jit(hv, vp, var_a[i], bb), lambda o: o[0][0,0,0])
    t2 = timeit(lambda i: m._pass2_jit(hv, vp, var_a[i], bb, *p1), lambda o: o[0][0,0,0])
    t3 = timeit(lambda i: m._sample_solve_batched_jit(warp, cert, 5000, jax.random.PRNGKey(i), hw, hw), lambda o: o[0,0,0])
    tot = t1 + t2 + t3
    print(f"B={b}: pass1 {t1*1e3/b:7.2f}  pass2 {t2*1e3/b:7.2f}  solve {t3*1e3/b:7.2f}  "
          f"total {tot*1e3/b:7.2f} ms/pair  = {b/tot:5.2f} pairs/s")
