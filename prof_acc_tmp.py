import time, math
import jax, jax.numpy as jnp, numpy as np
from rcvpose_tpu.config import Config
from rcvpose_tpu import train as train_mod, infer, geometry, fit
from rcvpose_tpu.ops import voting
from rcvpose_tpu.ops.voting import _prepare, exact_band, widened_band, VOTE_BAND, _COARSE, _TOPK, _WIN, ACC_UNIT_MM

REPS = 10
def timed(name, jitted, *args):
    out = jitted(*args); np.asarray(out)
    t0 = time.perf_counter(); out = jitted(*args); np.asarray(out)
    print(f"{name}: {(time.perf_counter()-t0)/REPS*1e3:.2f} ms", flush=True)

cfg = Config(compute_dtype="bfloat16", vote_grid_l=128, max_points=8192)
model = train_mod.build_model(cfg)
vs = [model.init(jax.random.PRNGKey(i), jnp.zeros((1,64,64,3)), False) for i in range(3)]
stacked = infer.stack_variables(vs)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(480,640,3)), jnp.float32)
depth = np.zeros((480,640), np.float32); depth[160:320,210:430] = rng.uniform(600,900,size=(160,220))
depth = jnp.asarray(depth)
k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)
maxr = jnp.asarray([2.0,2.2,2.4], jnp.float32)
gtk = jnp.asarray(rng.normal(size=(3,3))*100, jnp.float32)
GRID = 128

def nets(sv, image_norm):
    maps = []
    for i in range(3):
        v = jax.tree.map(lambda a, i=i: a[i], sv)
        seg, radial = model.apply(v, image_norm[None], False)
        maps.append((seg[0,:,:,0], radial[0,:,:,0]))
    return jnp.stack([m[0] for m in maps]), jnp.stack([m[1] for m in maps])

def pack(sem_map, radial_map, max_r):
    sem = (sem_map > 0.8) & (radial_map <= max_r)
    d = jnp.where(sem, depth, 0.0)
    xyz_map, valid = geometry.backproject_dense(d, k)
    flat_xyz = xyz_map.reshape(-1,3)/1000.0
    fv = valid.reshape(-1)
    (order,) = jnp.nonzero(fv, size=8192, fill_value=0)
    nv = jnp.sum(fv.astype(jnp.int32))
    mask = jnp.arange(8192) < nv
    pts = jnp.where(mask[:,None], flat_xyz[order], 0.0)
    rad = jnp.where(mask, radial_map.reshape(-1)[order], 0.0)
    return pts, rad, mask

def acc_partial(level):
    def fn(pts, rad, mask):
        p, rr, means, shift, bound = _prepare(pts, rad, mask)
        if level == 0:
            return means
        lc = GRID // _COARSE
        cc = jnp.arange(lc, dtype=jnp.float32)
        ci, cj, ck = jnp.meshgrid(cc, cc, cc, indexing="ij")
        cvox = (jnp.stack([ci.ravel(), cj.ravel(), ck.ravel()], 1) + 0.5) * _COARSE - 0.5
        slack = VOTE_BAND + math.sqrt(3.0)*_COARSE/2
        lo_c, hi_c = widened_band(rr, mask, slack)
        cv = voting.vote_counts(cvox, p, lo_c, hi_c)
        if level == 1:
            return cv[:4] + means[0]
        cb = jnp.ceil(bound / _COARSE)
        cin = cc < cb
        cvalid = ((cin[:,None,None] & cin[None,:,None]) & cin[None,None,:]).reshape(-1)
        cv = jnp.where(cvalid, cv, -1.0)
        _, top_idx = jax.lax.top_k(cv, _TOPK)
        if level == 2:
            return top_idx.astype(jnp.float32) + means[0]
        def window_base(cidx):
            c = jnp.stack([cidx // (lc*lc), (cidx // lc) % lc, cidx % lc]).astype(jnp.float32)
            return jnp.clip(c*_COARSE - (_WIN-_COARSE)//2, 0, GRID-_WIN)
        bases = jax.vmap(window_base)(top_idx)
        w = jnp.arange(_WIN, dtype=jnp.float32)
        wi, wj, wk = jnp.meshgrid(w, w, w, indexing="ij")
        local = jnp.stack([wi.ravel(), wj.ravel(), wk.ravel()], 1)
        win_vox = (bases[:,None,:] + local[None,:,:]).reshape(-1,3)
        lo_f, hi_f = exact_band(rr, mask)
        fv2 = voting.vote_counts(win_vox, p, lo_f, hi_f)
        if level == 3:
            return fv2[:4] + means[0]
        fvalid = jnp.all(win_vox < bound, axis=1)
        fv3 = jnp.where(fvalid, fv2, -1.0).reshape(_TOPK, -1)
        best_per = jnp.max(fv3, axis=1)
        kbest = jnp.argmax(best_per)
        widx = jnp.argmax(fv3[kbest])
        lb = jnp.stack([widx // (_WIN*_WIN), (widx // _WIN) % _WIN, widx % _WIN]).astype(jnp.float32)
        peak = bases[kbest] + lb
        return (peak + shift + means + 0.5) * ACC_UNIT_MM
    return fn

for level, name in [(0,'prepare'), (1,'+coarse vote'), (2,'+topk'), (3,'+refine vote'), (4,'+decode')]:
    accfn = acc_partial(level)
    @jax.jit
    def run(sv, img, accfn=accfn):
        def body(i, carry):
            im, acc = carry
            s, r = nets(sv, im)
            pts, rad, mask = jax.vmap(pack)(s, r, maxr)
            out = jax.vmap(accfn)(pts, rad, mask)
            red = out.reshape(-1)[0]
            return (im + red*1e-20, acc + red)
        _, a = jax.lax.fori_loop(0, REPS, body, (img, jnp.float32(0)))
        return a
    timed(f"nets+pack+{name}", run, stacked, img)
