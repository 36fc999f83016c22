"""Attribute training-step device time: join profiler op times with HLO fusion contents."""
import re, time
import jax, jax.numpy as jnp
import igdm_tpu.training.ddpm as ddpm
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.utils.prof import profile_trace, summarize_trace

B, N = 128, 8192
dc = DiffusionConfig()
tc = TrainConfig(batch_size=B, compute_dtype="bfloat16")
imgs = jax.random.normal(jax.random.PRNGKey(1), (N, 32, 32, 1), jnp.float32)
state, tx = ddpm.init_train_state(jax.random.PRNGKey(0), dc, tc)
fn = ddpm.build_epoch_fn(tx, dc, B, N, compute_dtype="bfloat16")
steps = -(-N // B)

lowered = fn.lower(state, imgs) if hasattr(fn, "lower") else None
txt = lowered.compile().as_text()

# map computation name -> set of interesting op kinds inside
comp_ops = {}
cur = None
for line in txt.splitlines():
    m = re.match(r"\s*%?([\w.\-]+)\s*\([^)]*\)\s*->.*{", line)
    if line.startswith("HloModule"):
        continue
    mm = re.match(r"\s*(%[\w.\-]+|ENTRY [\w.\-]+|[\w.\-]+)\s.*{\s*$", line)
    if mm and ("{" in line) and ("=" not in line):
        cur = mm.group(1).lstrip("%").replace("ENTRY ", "")
        comp_ops[cur] = set()
        continue
    if cur is None:
        continue
    for kind in ("convolution", "dot(", "reduce(", "reduce-window", "scatter", "gather", "rng", "transpose", "sort", "iota"):
        if kind.rstrip("(") + "(" in line or f" {kind} " in line or line.strip().startswith(kind):
            comp_ops[cur].add(kind.rstrip("("))

# fusion instruction name -> called computation
fusion_target = {}
for m in re.finditer(r"%?([\w.\-]+) = [^\n]*fusion\([^\n]*calls=%?([\w.\-]+)", txt):
    fusion_target[m.group(1)] = m.group(2)

state, loss = jax.block_until_ready(fn(state, imgs))
with profile_trace("/root/repo/_scratch/trace_cls"):
    state, loss = jax.block_until_ready(fn(state, imgs))

rows = summarize_trace("/root/repo/_scratch/trace_cls", top=400)
buckets = {}
total = 0.0
for name, ms in rows:
    base = name.split("(")[0]
    if base in ("0",) or base.startswith("jit_") or base.startswith("while"):
        continue
    total += ms
    tgt = fusion_target.get(base)
    kinds = comp_ops.get(tgt, set()) if tgt else set()
    if "convolution" in kinds or "dot" in kinds:
        b = "MXU (conv/dot fusion)"
    elif base.startswith("convolution") or base.startswith("dot"):
        b = "MXU (conv/dot fusion)"
    elif "reduce" in kinds or base.startswith(("reduce", "multiply_reduce", "convert_reduce")):
        b = "reduce fusion"
    elif "rng" in kinds or "sort" in kinds:
        b = "rng/sort"
    elif base.startswith(("copy", "broadcast", "convert", "bitcast", "tuple", "get-tuple")):
        b = "copy/broadcast/convert"
    else:
        b = "elementwise fusion"
    buckets.setdefault(b, [0.0, 0])
    buckets[b][0] += ms
    buckets[b][1] += 1
print(f"total attributed: {total/steps*1000:.1f} us/step over {steps} steps")
for b, (ms, cnt) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
    print(f"  {ms/steps*1000:8.1f} us/step  {ms/total*100:5.1f}%  n={cnt:3d}  {b}")

# top MXU and top elementwise individually
print("\ntop ops with classification:")
for name, ms in rows[:30]:
    base = name.split("(")[0]
    tgt = fusion_target.get(base)
    kinds = ",".join(sorted(comp_ops.get(tgt, set()))) if tgt else "-"
    print(f"  {ms/steps*1000:8.1f} us/step  {base[:60]:60s} [{kinds}]")
