"""Why does the local-corr Pallas kernel fall back at B=8? Probe directly."""
import jax
import jax.numpy as jnp
import traceback

from gfnet_tpu.ops.local_correlation import _pallas_probe, _pallas_vmem_estimate

# scale "2": pass1 (448): target (2B,224,224,16), query (2B,128,128,16), r=2
# pass2 (560): target (2B,280,280,16), query (2B,160,160,16), r=2
for b2, tshape, qshape, r in [
    (2, (2, 224, 224, 16), (2, 128, 128, 16), 2),
    (16, (16, 224, 224, 16), (16, 128, 128, 16), 2),
    (16, (16, 280, 280, 16), (16, 160, 160, 16), 2),
    (16, (16, 112, 112, 32), (16, 80, 80, 32), 4),   # scale "4" pass2-ish
]:
    for cd in (jnp.float32, jnp.bfloat16):
        est = _pallas_vmem_estimate(tshape, qshape, r, cd)
        q = jax.ShapeDtypeStruct(qshape, jnp.float32)
        t = jax.ShapeDtypeStruct(tshape, jnp.float32)
        f = jax.ShapeDtypeStruct(qshape[:3] + (2,), jnp.float32)
        try:
            _pallas_probe.lower(q, t, f, r, cd).compile()
            ok = "OK"
        except Exception as e:
            ok = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
        print(f"B={tshape[0]} t={tshape} r={r} cd={jnp.dtype(cd).name} est={est/1e6:.0f}MB -> {ok}", flush=True)
