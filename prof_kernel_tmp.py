import time, functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 20

def make_kernel(VB, PC, dimsem, cost):
    def _vote_kernel(vox_ref, pts_ref, out_ref, acc_ref):
        nc = pl.program_id(1)
        ncb = pl.num_programs(1)
        @pl.when(nc == 0)
        def _():
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
        vx = vox_ref[:, 0:1]; vy = vox_ref[:, 1:2]; vz = vox_ref[:, 2:3]
        px = pts_ref[0:1, :]; py = pts_ref[1:2, :]; pz = pts_ref[2:3, :]
        lo = pts_ref[3:4, :]; hi = pts_ref[4:5, :]
        dx = vx - px; dy = vy - py; dz = vz - pz
        d2 = dx*dx + dy*dy + dz*dz
        hit = jnp.logical_and(d2 > lo, d2 < hi)
        acc_ref[:, :] += hit.astype(jnp.float32)
        @pl.when(nc == ncb - 1)
        def _():
            out_ref[:, :] = jnp.sum(acc_ref[:, :], axis=1, keepdims=True)

    @functools.partial(jax.jit, static_argnames=())
    def vote(vox, pts):
        v = vox.shape[0]; n = pts.shape[1]
        nvb = v // VB; ncb = n // PC
        params = {}
        if dimsem:
            params['compiler_params'] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
        kwargs = {}
        if cost:
            kwargs['cost_estimate'] = pl.CostEstimate(
                flops=12*v*n, bytes_accessed=v*16+n*32+v*4, transcendentals=0)
        return pl.pallas_call(
            _vote_kernel,
            grid=(nvb, ncb),
            in_specs=[
                pl.BlockSpec((VB, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, PC), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((VB, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((v, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((VB, PC), jnp.float32)],
            **params, **kwargs,
        )(vox, pts)
    return vote

rng = np.random.default_rng(0)
N = 8192
V = 32768  # coarse grid for L=128
vox = jnp.asarray(np.pad(rng.uniform(0,128,size=(V,3)), ((0,0),(0,1))), jnp.float32)
ptsrow = np.zeros((8, N), np.float32)
ptsrow[:3] = rng.uniform(20,100, size=(3,N))
r = np.round(rng.uniform(10,38,size=N))
ptsrow[3] = (r-4)**2; ptsrow[4] = (r+4)**2
pts = jnp.asarray(ptsrow)

def timed(vote):
    @jax.jit
    def run(vox, pts):
        def body(i, carry):
            vv, acc = carry
            o = vote(vv, pts)
            return (vv + o[0,0]*1e-20, acc + o[0,0])
        _, acc = jax.lax.fori_loop(0, REPS, body, (vox, jnp.float32(0)))
        return acc
    float(run(vox, pts))
    t0=time.perf_counter(); float(run(vox, pts))
    return (time.perf_counter()-t0)/REPS

for VB, PC, ds, ce in [(1024,512,False,False),(1024,1024,False,False),
                        (2048,512,False,False),(1024,512,True,False),
                        (1024,1024,True,False),(1024,1024,True,True),
                        (512,2048,True,False)]:
    try:
        dt = timed(make_kernel(VB,PC,ds,ce))
        gps = V*N/dt/1e9
        print(f"VB={VB} PC={PC} dimsem={ds} cost={ce}: {dt*1e3:.2f} ms  {gps:.0f} Gpairs/s", flush=True)
    except Exception as e:
        print(f"VB={VB} PC={PC} dimsem={ds} cost={ce}: FAIL {type(e).__name__}", flush=True)
