"""Per-op roofline of the bf16 serving sampler (VERDICT r3 task 1).

For every conv in the serving step, measure the ISOLATED XLA time for the
exact shape/dtype/epilogue, then compare with the in-program per-fusion
times from the bench profiler trace.

Methodology (v3 — the first attempt added a full-array anti-CSE
perturbation whose elementwise pass dominated the measurement):
* loop-carry the input and mutate ONE element per iteration
  (x.at[0,0,0,0].set(i)) — defeats both CSE and loop-invariant hoisting at
  ~zero bandwidth cost (the DUS aliases the scan carry in place);
* read the conv time from the profiler's device op lane, not wall clock,
  so the residual scan overhead doesn't pollute the per-op number.

Run on the real chip:  python _scratch/roofline_sampler.py
"""

import sys, time, collections, glob, gzip, json, shutil, tempfile
sys.path.insert(0, "/root/repo")

import jax, jax.numpy as jnp
import numpy as np

B = 256
R = 200  # conv applications per timed program
PEAK_TFS = 197.0  # v5e bf16


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def _op_lane_us(logdir):
    """{op_name: total_us} from the device 'XLA Ops' lane."""
    tot = collections.Counter()
    for f in glob.glob(logdir + "/**/*.trace.json.gz", recursive=True):
        data = json.load(gzip.open(f, "rt"))
        ev = data.get("traceEvents", [])
        dev = {e["pid"] for e in ev if e.get("ph") == "M" and e.get("name") == "process_name"
               and "device" in (e.get("args", {}).get("name") or "").lower()}
        ops_tid = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
                   and e.get("name") == "thread_name" and e.get("pid") in dev
                   and "ops" in (e.get("args", {}).get("name") or "").lower()}
        for e in ev:
            if e.get("ph") == "X" and "dur" in e and (e.get("pid"), e.get("tid")) in ops_tid:
                if not e["name"].startswith(("while", "jit_")):
                    tot[e["name"]] += e["dur"]
    return tot


def bench_body(make_y, x0, label, gf):
    """Time `y = make_y(x)` repeated R times; report conv-fusion us/iter from
    the profiler op lane (the dominant op), plus the whole-body us/iter."""
    from igdm_tpu.utils.prof import profile_trace

    @jax.jit
    def run(x0):
        def body(x, i):
            x = x.at[(0,) * x.ndim].set(i.astype(x.dtype))
            y = make_y(x)
            return x, jnp.float32(y.ravel()[0])
        _, outs = jax.lax.scan(body, x0, jnp.arange(R))
        return jnp.sum(outs)

    _sync(run(x0))
    td = tempfile.mkdtemp(prefix="roofline_")
    with profile_trace(td):
        _sync(run(x0))
    ops = _op_lane_us(td)
    shutil.rmtree(td, ignore_errors=True)
    total_us = sum(ops.values()) / R
    # the conv is the dominant op in the body
    conv_name, conv_us = max(ops.items(), key=lambda kv: kv[1])
    conv_us /= R
    tfs = gf / (conv_us / 1e6) / 1e3 if conv_us else float("nan")
    rest = total_us - conv_us
    print(f"{label:22s} conv {conv_us:7.1f} us ({tfs:6.1f} TF/s, {100*tfs/PEAK_TFS:5.1f}% peak) "
          f"| body {total_us:7.1f} us (other {rest:5.1f}) | top op {conv_name[:30]}")
    return conv_us, total_us


def conv_fn(wgt, bias, relu=True):
    def f(x):
        dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape, ("NHWC", "HWIO", "NHWC"))
        # bf16 output natively (what the compiled sampler emits — routing
        # through preferred f32 + convert adds an unfused 2x-width
        # materialization, measured +110 us on the 64ch@32 shape)
        y = jax.lax.conv_general_dilated(
            x, wgt, (1, 1), "SAME", dimension_numbers=dn,
        ) + bias
        return jnp.maximum(y, 0) if relu else y
    return f


if __name__ == "__main__":
    print(jax.devices())
    rows = [
        ("down1.conv1(1->64)",  32, 1, 64, 3),
        ("down1.conv2",         32, 64, 64, 3),
        ("down2.conv1",         16, 64, 128, 3),
        ("down2.conv2/mid*",    16, 128, 128, 3),
        ("up2/up1.conv2 64ch",  32, 64, 64, 3),
        ("up1.conv1",           32, 128, 64, 3),
        ("final 1x1",           32, 64, 1, 1),
    ]
    total = 0.0
    for label, hw, cin, cout, k in rows:
        wgt = jax.random.normal(jax.random.PRNGKey(0), (k, k, cin, cout), jnp.bfloat16) * 0.05
        bias = jnp.zeros((cout,), jnp.bfloat16)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (B, hw, hw, cin), jnp.bfloat16)
        gf = 2 * k * k * cin * cout * hw * hw * B / 1e9
        bench_body(conv_fn(wgt, bias), x0, label, gf)

    # convT via the repo's einsum+pixel-shuffle
    from igdm_tpu.ops.nn import conv_transpose2d
    wgt = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 128, 64), jnp.bfloat16) * 0.05
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, 128), jnp.bfloat16)
    bench_body(lambda x: conv_transpose2d(x, wgt).astype(jnp.bfloat16), x0,
               "up2.convt", 2 * 2 * 2 * 128 * 64 * 16 * 16 * B / 1e9)
