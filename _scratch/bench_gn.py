"""Pallas fused GN+SiLU vs XLA, relay-safe: scan-repeat inside one program, scalar fetch."""
import jax, jax.numpy as jnp, time
from igdm_tpu.ops.pallas.fused_groupnorm_silu import fused_groupnorm_silu, _reference

R = 50
def scan_time(f, x, s, bi):
    @jax.jit
    def run(x, s, bi):
        def body(c, _):
            return f(c, s, bi), None
        y, _ = jax.lax.scan(body, x, None, length=R)
        return jnp.sum(y[0,0,0])  # scalar fetch
    float(run(x, s, bi))  # compile+warm
    t0 = time.perf_counter(); float(run(x, s, bi)); t1 = time.perf_counter()
    return (t1 - t0) / R

@jax.jit
def null(x): return jnp.sum(x[0,0,0])

shapes = [(64,64,64,64),(64,32,32,128),(128,32,32,64),(128,16,16,128),(256,64,64,64)]
for (b,h,w,c) in shapes:
    x = jax.random.normal(jax.random.PRNGKey(0), (b,h,w,c), jnp.float32)
    s = jnp.ones((c,)); bi = jnp.zeros((c,))
    fp = lambda x,s,bi: fused_groupnorm_silu(x,s,bi,groups=8)
    fx = lambda x,s,bi: _reference(x,s,bi,8,1e-5)
    tp = scan_time(fp, x, s, bi)
    tx = scan_time(fx, x, s, bi)
    gb = b*h*w*c*4*2/1e9
    print(f"{(b,h,w,c)}: pallas {tp*1e3:.3f} ms ({gb/tp:.0f} GB/s)  xla {tx*1e3:.3f} ms ({gb/tx:.0f} GB/s)  ratio {tp/tx:.2f}")
