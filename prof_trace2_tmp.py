import glob
import jax, jax.numpy as jnp, numpy as np
from rcvpose_tpu.config import Config
from rcvpose_tpu import train as train_mod, infer, geometry

cfg = Config(compute_dtype="bfloat16")
model = train_mod.build_model(cfg)
vlist = tuple(jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype==jnp.float32 else a,
              model.init(jax.random.PRNGKey(i), jnp.zeros((1,64,64,3)), False)) for i in range(3))
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(480,640,3)), jnp.float32)
depth = np.zeros((480,640), np.float32); depth[160:320,210:430] = rng.uniform(600,900,size=(160,220))
depth = jnp.asarray(depth)
k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
maxr = jnp.asarray([2.0,2.2,2.4], jnp.float32)
gtk = jnp.asarray(rng.normal(size=(3,3))*100, jnp.float32)

@jax.jit
def frame(vl, im):
    out = infer.frame_pose(model.apply, vl, im, depth, k, maxr, gtk,
                           n_points=8192, grid_l=128, mode="hier")
    return out["rt"]

np.asarray(frame(vlist, img))
jax.profiler.start_trace("/tmp/rcv_trace3")
for _ in range(3):
    r = frame(vlist, img)
np.asarray(r)
jax.profiler.stop_trace()

from jax.profiler import ProfileData
files = glob.glob("/tmp/rcv_trace3/**/*.xplane.pb", recursive=True)
pd = ProfileData.from_file(sorted(files)[-1])
for plane in pd.planes:
    if "TPU" not in plane.name:
        continue
    agg = {}
    for line in plane.lines:
        for ev in line.events:
            agg[ev.name] = agg.get(ev.name, 0) + ev.duration_ns
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    for n, d in top:
        print(f"  {d/1e6/3:8.3f} ms/frame  {n[:130]}")
