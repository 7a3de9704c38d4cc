import time, math
import jax, jax.numpy as jnp, numpy as np
from rcvpose_tpu.config import Config
from rcvpose_tpu import train as train_mod, infer, geometry
from rcvpose_tpu.ops import voting

REPS = 10
def timed(name, jitted, *args):
    out = jitted(*args); np.asarray(out)
    t0 = time.perf_counter(); out = jitted(*args); np.asarray(out)
    print(f"{name}: {(time.perf_counter()-t0)/REPS*1e3:.2f} ms", flush=True)

cfg = Config(compute_dtype="bfloat16")
model = train_mod.build_model(cfg)
vs = [model.init(jax.random.PRNGKey(i), jnp.zeros((1,64,64,3)), False) for i in range(3)]
stacked = infer.stack_variables(vs)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(480,640,3)), jnp.float32)
depth = np.zeros((480,640), np.float32); depth[160:320,210:430] = rng.uniform(600,900,size=(160,220))
depth = jnp.asarray(depth)
k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
maxr = jnp.asarray([2.0,2.2,2.4], jnp.float32)

pts_c = jnp.asarray(rng.uniform(0.0,0.12,size=(3,8192,3)) + np.array([0,0,0.7]), jnp.float32)
rad_c = jnp.asarray(rng.uniform(0.5,1.9,size=(3,8192)), jnp.float32)
mask_c = jnp.ones((3,8192), bool)

def nets(sv, image_norm):
    maps = []
    for i in range(3):
        v = jax.tree.map(lambda a, i=i: a[i], sv)
        seg, radial = model.apply(v, image_norm[None], False)
        maps.append((seg[0,:,:,0], radial[0,:,:,0]))
    return jnp.stack([m[0] for m in maps]), jnp.stack([m[1] for m in maps])

def acc3(pts, rad, mask):
    return jax.vmap(lambda a,b,c: voting.accumulate_3d(a,b,c,grid_l=128,mode="hier").center_mm)(pts, rad, mask)

# A: nets + vote on CONSTANT points (no pack)
@jax.jit
def run_a(sv, img, pts, rad, mask):
    def body(i, carry):
        im, acc = carry
        s, r = nets(sv, im)
        centers = acc3(pts + s.mean()*1e-20, rad, mask)
        return (im + centers[0,0]*1e-20, acc + centers.sum())
    _, a = jax.lax.fori_loop(0, REPS, body, (img, jnp.float32(0)))
    return a
timed("nets + vote(const pts)", run_a, stacked, img, pts_c, rad_c, mask_c)

# B: pack (from constant maps, no nets) + vote
sem_m = jnp.zeros((3,480,640), jnp.float32).at[:,160:320,210:430].set(1.0)
rad_m = jnp.zeros((3,480,640), jnp.float32).at[:,160:320,210:430].set(
    jnp.asarray(rng.uniform(0.5,1.9,size=(3,160,220)), jnp.float32))
def pack(sem_map, radial_map, max_r):
    sem = (sem_map > 0.8) & (radial_map <= max_r)
    d = jnp.where(sem, depth, 0.0)
    xyz_map, valid = geometry.backproject_dense(d, k)
    fv = valid.reshape(-1)
    (order,) = jnp.nonzero(fv, size=8192, fill_value=0)
    nv = jnp.sum(fv.astype(jnp.int32))
    mask = jnp.arange(8192) < nv
    pts = jnp.where(mask[:,None], (xyz_map.reshape(-1,3)/1000.0)[order], 0.0)
    rad = jnp.where(mask, radial_map.reshape(-1)[order], 0.0)
    return pts, rad, mask

@jax.jit
def run_b(sem_m, rad_m):
    def body(i, carry):
        sm, acc = carry
        pts, rad, mask = jax.vmap(pack)(sm, rad_m, maxr)
        centers = acc3(pts, rad, mask)
        return (sm + centers[0,0]*1e-20, acc + centers.sum())
    _, a = jax.lax.fori_loop(0, REPS, body, (sem_m, jnp.float32(0)))
    return a
timed("pack + vote (no nets)", run_b, sem_m, rad_m)
