"""Device-mesh helpers: the framework's entire distributed surface.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(train.py:31-34) — replicate the model, scatter the batch over local GPUs,
gather. The TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` over all
devices with the batch sharded on the ``data`` axis and parameters
replicated; XLA inserts the gradient all-reduce over ICI automatically when
the train step is jit-compiled with these shardings. Multi-host scale-out is
the same code after ``jax.distributed.initialize()``.

``shard_points`` additionally shards the voting workload: each device counts
votes for its slice of the point cloud and the per-voxel counts are summed
with ``psum`` — the "long-context" analogue for this workload (SURVEY.md §5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over ``n_devices`` global devices.

    Single-process: a prefix of ``jax.devices()``. Multi-host: the mesh
    must span EVERY process — ``jax.devices()`` lists process 0's chips
    first, so a naive prefix of size < device_count would land entirely on
    host 0 and the other hosts' ``make_array_from_process_local_data``
    contributions would have no addressable shards. Instead each process
    contributes ``n_devices / process_count`` of its local chips (the
    first ones, in device order), so per-host batches map onto per-host
    mesh slots. ``n_devices`` must then be a multiple of the process count.
    """
    if devices is None:
        devices = jax.devices()
        nproc = jax.process_count()
        if n_devices is not None and nproc > 1 and n_devices < len(devices):
            if n_devices % nproc:
                raise ValueError(
                    f"multi-host mesh size {n_devices} must be a multiple "
                    f"of the process count {nproc}")
            per = n_devices // nproc
            devices = [d for p in range(nproc)
                       for d in [q for q in devices
                                 if q.process_index == p][:per]]
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def local_data_mesh():
    """1-D mesh over THIS process's addressable devices only.

    The multi-host evaluation building block: ``--mode test`` shards the
    frame list across processes (frame IO is process-local), and each
    process runs the data-parallel eval program over its OWN chips — no
    cross-process collective inside the per-frame program; only the tiny
    host-side metric reduction (``host_allgather``) crosses processes.
    """
    return Mesh(np.asarray(jax.local_devices()), ("data",))


def host_allgather(x):
    """Gather one same-shaped host array per process -> stacked
    ``(process_count, ...)`` numpy array.

    The host-side metric reduction for multi-host ``--mode test``: per-class
    ADD counts and stage times are a few floats, so this rides the jax
    coordination/collective machinery (``multihost_utils.process_allgather``)
    once per class rather than shipping frames anywhere. Every process must
    call it the same number of times in the same order (it is a collective).
    """
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def host_allgather_concat(x):
    """Concatenate variable-length 1-D host arrays across processes, in
    process order (YCB's AUC needs the gathered per-frame score list, not
    just counts). Two tiny allgathers: lengths, then padded values."""
    x = np.asarray(x, np.float32).reshape(-1)
    lens = host_allgather(np.array([x.size], np.int32))[:, 0]
    m = max(int(lens.max()) if lens.size else 0, 1)
    pad = np.zeros((m,), np.float32)
    pad[:x.size] = x
    rows = host_allgather(pad)
    return np.concatenate([rows[i, :int(lens[i])]
                           for i in range(len(lens))])


def batch_sharding(mesh):
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def warm_collectives(mesh):
    """Establish the mesh clique's cross-process communicator with one
    trivial all-reduce. Multi-host CPU collectives go through Gloo, whose
    context init has a fixed ~30 s key-value deadline; deferring it to the
    first real train step races that deadline against the hosts'
    compile-completion skew (step compiles are minutes — the SKEW alone
    can exceed 30 s, and the loser dies with "Gloo context initialization
    failed: DEADLINE_EXCEEDED"). A sub-second reduce right after mesh
    construction pins the init to a point where the hosts are milliseconds
    apart; the heavy steps then reuse the established context. No-op on a
    single process (local collectives need no context) — and the clique
    must match: the reduce runs over exactly this mesh's devices.
    """
    if jax.process_count() == 1:
        return
    import jax.numpy as jnp

    per_host = mesh.devices.size // jax.process_count()
    x = shard_batch(mesh, np.zeros((max(per_host, 1),), np.float32))
    jax.jit(jnp.sum, out_shardings=replicated(mesh))(x).block_until_ready()


def shard_batch(mesh, batch):
    """Place a host batch pytree with the leading axis sharded over 'data'.

    Single-process: a plain device_put. Multi-host (after
    ``jax.distributed.initialize``): each process passes its PER-HOST batch
    and the pieces are assembled into one global array whose leading axis is
    the global batch (``jax.make_array_from_process_local_data`` — a
    device_put to a global sharding cannot address other hosts' chips).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def sharded_frame_pose(mesh, apply_fn, variables, images_norm, depths_mm, k,
                       max_radii_dm, gt_kpts_mm, fused=None, **kw):
    """Data-parallel EVALUATION: a batch of frames sharded over the mesh,
    each device running the whole fused frame program (net -> vote -> Horn)
    on its shard; weights replicated. The eval-side mirror of the DP train
    step — throughput scales with chips for offline dataset sweeps. Batch
    size must be a multiple of the mesh size. Returns the batched frame
    dict with every leaf sharded on the leading axis.

    ``variables``: a tuple/list of 3 per-keypoint trees (3-net mode) or a
    single multi-head tree (fused mode). The container type picks the path
    when ``fused`` is None, so a *stacked* 3-net pytree (leading axis 3 from
    ``infer.stack_variables`` — a dict, not a tuple) would misroute into the
    fused net; pass ``fused=False`` explicitly for that form (the stacked
    params are then sliced per net, like ``infer._frame_pose`` does).
    """
    from rcvpose_tpu import infer

    bsh = batch_sharding(mesh)
    repl = replicated(mesh)
    if fused is None:
        fused = _is_fused(variables)
    base = infer._frame_pose_fused if fused else infer._frame_pose

    def one(vars_, img, dep, k, mr, gk):
        return base(apply_fn, vars_, img, dep, k, mr, gk, **kw)

    batched = jax.jit(
        jax.vmap(one, in_axes=(None, 0, 0, None, None, None)),
        in_shardings=(repl, bsh, bsh, repl, repl, repl),
    )
    return batched(variables, images_norm, depths_mm, k, max_radii_dm,
                   gt_kpts_mm)


def _is_fused(variables):
    """Heuristic: a tuple/list of 3 trees = per-keypoint nets; a single
    variables tree = fused multi-head net."""
    return not isinstance(variables, (tuple, list))


# One jitted DP-eval program per (mesh, net module, vote knobs, branch):
# the eval loops call sharded_frame_scores once per mesh-sized CHUNK, and
# a fresh closure + jax.jit per chunk would re-trace (and, cache-cold,
# re-compile) the whole net->vote->ICP program every few frames. Keyed on
# the apply_fn's owning module (flax modules hash by value), equal-config
# nets share one program across classes too — the same no-per-class-
# recompile property the traced-arguments design below gives the HLO.
_FRAME_SCORES_PROGRAMS = {}


def sharded_frame_scores(mesh, apply_fn, variables, images_norm, depths_mm,
                         rt_gts_mm, k, max_radii_dm, gt_kpts_mm, cad_mm, sym,
                         **kw):
    """Data-parallel DATASET EVALUATION: the full per-frame eval program
    (net forward -> 3x vote -> Horn -> ADD -> ICP -> ADD) over a batch of
    frames sharded on the mesh, weights/CAD replicated — the ``--mode
    test`` loop (reference AccumulatorSpace.py:553-740) scaled over chips.
    Differs from ``sharded_frame_pose`` (the SERVING program: windowed
    shared packing, no GT) in that it runs the exact sequential-eval math
    (``eval.keypoint_from_maps`` per keypoint against the GT pose) so a
    data-parallel ``--mode test`` reproduces the sequential loop's ADD.

    ``apply_fn=None`` evaluates precomputed radial maps instead: pass
    (B, 3, H, W) sem/radial stacks as ``maps=(sems, radials)`` in place of
    ``variables``/``images_norm``. ``k`` is per-frame (B, 3, 3) — YCB
    intrinsics come from each frame's .mat; LM/LMO tile one matrix.
    Batch size must be a multiple of the mesh size. Returns per-frame
    score_bf/score_af (mm), rts and overflow flags, sharded on the
    leading axis.
    """
    from rcvpose_tpu import eval as eval_mod

    bsh = batch_sharding(mesh)
    repl = replicated(mesh)
    # per-class data (CAD cloud, clips, GT kpts, symmetry) are traced
    # ARGUMENTS, not closure captures: captures bake into the HLO as
    # inline constants (remote-compile payload blowup) and force a fresh
    # compile per class even at equal shapes
    import jax.numpy as jnp
    sym = jnp.asarray(sym, bool)

    kw_key = tuple(sorted(kw.items()))
    if apply_fn is None:
        sems, radials = variables  # (B, 3, H, W) precomputed maps
        key = (mesh, None, kw_key)
        batched = _FRAME_SCORES_PROGRAMS.get(key)
        if batched is None:
            def one(sem, rad, dep, rt_gt, k, mr, gk, cad, sym):
                return eval_mod._frame_scores(sem, rad, dep, k, mr, gk, cad,
                                              rt_gt, sym, **kw)

            batched = jax.jit(
                jax.vmap(one, in_axes=(0, 0, 0, 0, 0) + (None,) * 4),
                in_shardings=(bsh,) * 5 + (repl,) * 4)
            _FRAME_SCORES_PROGRAMS[key] = batched
        return batched(sems, radials, depths_mm, rt_gts_mm, k, max_radii_dm,
                       gt_kpts_mm, cad_mm, sym)

    owner = getattr(apply_fn, "__self__", apply_fn)
    key = (mesh, owner, kw_key)
    try:
        batched = _FRAME_SCORES_PROGRAMS.get(key)
    except TypeError:   # module with unhashable fields (list-valued blocks)
        key = (mesh, id(owner), kw_key)
        batched = _FRAME_SCORES_PROGRAMS.get(key)
    if batched is None:
        def one(vars_, img, dep, rt_gt, k, mr, gk, cad, sym):
            return eval_mod._frame_scores_net(apply_fn, vars_, img, dep, k,
                                              mr, gk, cad, rt_gt, sym, **kw)

        batched = jax.jit(
            jax.vmap(one, in_axes=(None, 0, 0, 0, 0) + (None,) * 4),
            in_shardings=(repl,) + (bsh,) * 4 + (repl,) * 4)
        _FRAME_SCORES_PROGRAMS[key] = batched
    return batched(variables, images_norm, depths_mm, rt_gts_mm, k,
                   max_radii_dm, gt_kpts_mm, cad_mm, sym)


def sharded_vote_counts(mesh, voxels, points, lo, hi):
    """Vote counting with points sharded over the mesh and grids psum-ed.

    Each device evaluates its point shard against the (replicated) voxel
    list; ICI carries one (V,)-sized all-reduce. Points must be padded to a
    multiple of the mesh size (masked entries have lo == hi == 0).
    """
    from rcvpose_tpu.ops.voting import vote_counts

    def local(voxels, points, lo, hi):
        partial = vote_counts(voxels, points, lo, hi)
        return jax.lax.psum(partial, "data")

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=P(),
        # the scan carry inside vote_counts is device-invariant zeros; skip
        # the varying-manual-axes check rather than pvary-annotating it
        check_vma=False,
    )
    return fn(voxels, points, lo, hi)
