"""Find the B cutoff where scale-2 local-corr Pallas compile crashes."""
import jax
import jax.numpy as jnp

from gfnet_tpu.ops.local_correlation import _pallas_probe

for b in (4, 8, 12, 16):
    tshape = (b, 224, 224, 16)
    qshape = (b, 128, 128, 16)
    q = jax.ShapeDtypeStruct(qshape, jnp.float32)
    t = jax.ShapeDtypeStruct(tshape, jnp.float32)
    f = jax.ShapeDtypeStruct(qshape[:3] + (2,), jnp.float32)
    try:
        _pallas_probe.lower(q, t, f, 2, jnp.float32).compile()
        ok = "OK"
    except Exception as e:
        ok = f"FAIL {type(e).__name__} {str(e)[:120]}"
    print(f"B={b} -> {ok}", flush=True)
