"""Pallas flash attention vs XLA attention, relay-safe scan-repeat timing.

Forward and forward+backward, f32 and bf16, across sequence lengths.
"""
import time

import jax
import jax.numpy as jnp

from igdm_tpu.ops.pallas.flash_attention import flash_attention, mha_reference


def scan_time(f, args, R):
    @jax.jit
    def run(*args):
        def body(c, _):
            q, k, v = c
            o = f(q, k, v)
            # feed output back into the carry (anti-CSE, O(1)-cheap add)
            return (q + o * 1e-20, k, v), None
        (q, _, _), _ = jax.lax.scan(body, args, None, length=R)
        return jnp.sum(q[0, 0, 0, 0])

    float(run(*args))
    t0 = time.perf_counter(); float(run(*args)); t1 = time.perf_counter()
    return (t1 - t0) / R


def scan_time_grad(f, args, R):
    def loss(q, k, v):
        return jnp.sum(f(q, k, v) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(*args):
        def body(c, _):
            q, k, v = c
            dq, dk, dv = g(q, k, v)
            return (q + dq * 1e-20, k + dk * 1e-20, v + dv * 1e-20), None
        (q, _, _), _ = jax.lax.scan(body, args, None, length=R)
        return jnp.sum(q[0, 0, 0, 0])

    float(run(*args))
    t0 = time.perf_counter(); float(run(*args)); t1 = time.perf_counter()
    return (t1 - t0) / R


def main():
    D = 64
    for dtype in (jnp.float32, jnp.bfloat16):
        for (B, H, N) in [(8, 4, 1024), (2, 4, 4096), (1, 4, 8192)]:
            R = max(4, min(30, (2 * 4 * 4096) // (B * H * N // 1024)))
            key = jax.random.PRNGKey(0)
            kq, kk, kv = jax.random.split(key, 3)
            q = jax.random.normal(kq, (B, H, N, D), dtype)
            k = jax.random.normal(kk, (B, H, N, D), dtype)
            v = jax.random.normal(kv, (B, H, N, D), dtype)
            scale = 1.0 / D**0.5
            fl = lambda q, k, v: flash_attention(q, k, v)
            xl = lambda q, k, v: mha_reference(q, k, v, scale=scale)
            tf_, tx = scan_time(fl, (q, k, v), R), scan_time(xl, (q, k, v), R)
            gf, gx = scan_time_grad(fl, (q, k, v), R), scan_time_grad(xl, (q, k, v), R)
            # 4*N^2*D flops per (b,h) fwd (qk + pv)
            fl_tf = 4 * N * N * D * B * H / 1e12
            print(
                f"{dtype.__name__:9s} B{B} H{H} N{N}: "
                f"fwd flash {tf_*1e3:7.3f} ms ({fl_tf/tf_:6.1f} TF/s)  "
                f"xla {tx*1e3:7.3f} ms ({fl_tf/tx:6.1f} TF/s)  speedup {tx/tf_:4.2f}x | "
                f"fwd+bwd flash {gf*1e3:7.3f} ms  xla {gx*1e3:7.3f} ms  speedup {gx/gf:4.2f}x"
            )


if __name__ == "__main__":
    main()
