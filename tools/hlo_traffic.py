import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import re, collections
import jax, jax.numpy as jnp
from dit4sr_tpu.config import mmdit_base
from dit4sr_tpu.models.mmdit import MMDiT, fold_control_projections

base_cfg = mmdit_base().with_(param_dtype=jnp.bfloat16)
mcfg = base_cfg.with_(folded_control=True)
mmdit = MMDiT(mcfg)
lat = jnp.zeros((1, 64, 64, 16), jnp.bfloat16)
txt = jnp.zeros((1, 333, 4096), jnp.bfloat16)
pool = jnp.zeros((1, 2048), jnp.bfloat16)
t = jnp.zeros((1,), jnp.float32)
params = jax.jit(lambda: MMDiT(base_cfg).init(jax.random.PRNGKey(0), lat, lat, txt, pool, t))()
params = fold_control_projections(params, base_cfg)

comp = jax.jit(lambda p, a, b, c, d: mmdit.apply(p, a, a, b, c, d)).lower(params, lat, txt, pool, t).compile()
txt_hlo = comp.as_text()
DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2, "s8": 1, "u8": 1}

def shape_bytes(s):
    total = 0
    for m in re.finditer(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([0-9,]*)\]", s):
        n = 1
        if m.group(2):
            for d in m.group(2).split(","):
                n *= int(d)
        total += n * DT[m.group(1)]
    return total

cur_comp = None
agg = collections.Counter(); cnt = collections.Counter(); insts = []
for line in txt_hlo.splitlines():
    mm = re.match(r"\s*(ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->", line)
    if mm and "{" in line:
        cur_comp = mm.group(2)
        continue
    if cur_comp is None or cur_comp.startswith(("fused", "region")):
        continue
    line_s = line.strip()
    m = re.match(r"(?:ROOT )?%?([\w.\-]+) = ((?:\([^)]*\))|(?:\w+\[[0-9,]*\][^ ]*)) ([\w\-]+)", line_s)
    if not m:
        continue
    op = m.group(3)
    if op in ("parameter", "constant", "tuple", "get-tuple-element", "bitcast"):
        continue
    b = shape_bytes(m.group(2))
    agg[op] += b; cnt[op] += 1
    insts.append((b, m.group(1), op, cur_comp))

total = sum(agg.values())
print(f"total materialized output bytes: {total/1e9:.2f} GB")
for op, b in agg.most_common(14):
    print(f"{op:22s} {b/1e9:7.2f} GB  ({cnt[op]} ops)")
insts.sort(reverse=True)
print("\ntop singles:")
seen = collections.Counter()
for b, name, op, c in insts[:400]:
    base = re.sub(r"[.\d]+$", "", name)
    if seen[base] > 2: continue
    seen[base] += 1
    print(f"  {b/1e6:8.1f} MB  {op:15s} {name[:60]}  [{c[:30]}]")
    if sum(seen.values()) > 30: break
