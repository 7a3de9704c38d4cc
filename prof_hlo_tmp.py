import jax, jax.numpy as jnp, numpy as np, math, re
from rcvpose_tpu.config import Config
from rcvpose_tpu import train as train_mod, infer, geometry
from rcvpose_tpu.ops import voting

cfg = Config(compute_dtype="bfloat16")
model = train_mod.build_model(cfg)
vs = [model.init(jax.random.PRNGKey(i), jnp.zeros((1,64,64,3)), False) for i in range(3)]
stacked = infer.stack_variables(vs)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(480,640,3)), jnp.float32)
depth = jnp.asarray(np.zeros((480,640), np.float32))
k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
maxr = jnp.asarray([2.0,2.2,2.4], jnp.float32)
gtk = jnp.asarray(rng.normal(size=(3,3))*100, jnp.float32)

def frame(sv, im):
    out = infer.frame_pose(model.apply, sv, im, depth, k, maxr, gtk,
                           n_points=8192, grid_l=128, mode="hier")
    return out["rt"]

lowered = jax.jit(frame).lower(stacked, img)
compiled = lowered.compile()
txt = compiled.as_text()
print("total HLO lines:", len(txt.splitlines()))
for pat in ["custom-call", "sort", "transpose", "scatter", "while"]:
    lines = [l.strip()[:180] for l in txt.splitlines() if pat in l and "fused" not in l[:20]]
    print(f"--- {pat}: {len(lines)}")
    for l in lines[:12]:
        print("   ", l)
