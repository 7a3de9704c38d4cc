"""Two-process ``jax.distributed`` smoke: real multi-process DP training.

Single-machine stand-in for a multi-host TPU pod: two OS processes, each a
JAX "host" with 4 virtual CPU devices, coordinated through
``jax.distributed.initialize``. Proves the ``--distributed`` contract end
to end (the reference's only parallelism is single-process DataParallel,
/root/reference/train.py:31-34 — it has no multi-host story at all):

* global 8-device mesh built from ``jax.devices()`` across both processes,
* per-host batches assembled into one global array by
  ``parallel.shard_batch`` (``make_array_from_process_local_data``),
* the production pjit train step with XLA collectives crossing the
  process boundary,
* identical replicated loss on every host (printed; the parent compares).

Usage: ``python scripts/multihost_smoke.py`` (parent; spawns workers)
       ``python scripts/multihost_smoke.py worker <pid> <nprocs> <port>``

``--full`` runs the whole production entry point instead of a single step:
each worker calls ``cli.run_train`` on a shared synthetic LINEMOD tree,
which exercises distributed init -> per-process loader sharding
(data/loader.py shard_rank/shard_count) -> cross-process mesh sizing
(cli.run_train + parallel.data_mesh picking chips from EVERY process) ->
pjit train/eval steps with cross-process collectives -> coordinated orbax
checkpointing to one shared directory. The parent asserts both hosts end
with the identical best validation loss and that the checkpoint pair
exists on disk.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROCS = 2
DEV_PER_PROC = 4


def worker(pid, nprocs, port):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=True, repo_root=REPO)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == DEV_PER_PROC
    n_global = nprocs * DEV_PER_PROC
    assert jax.device_count() == n_global

    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from rcvpose_tpu import parallel, train as train_mod
    from rcvpose_tpu.config import Config

    per_host = DEV_PER_PROC  # one sample per device
    cfg = Config(compute_dtype="float32", image_height=32, image_width=32,
                 batch_size=per_host)
    mesh = parallel.data_mesh(n_global)
    state = train_mod.create_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=10,
        blocks=(1, 1, 1, 1), sample_shape=(1, 32, 32, 3), width=0.125)
    p_train, p_eval = train_mod.make_parallel_steps(mesh)

    # per-host batch with HOST-DISTINCT data: the global batch seen by the
    # train step is the concatenation, so the loss depends on both hosts'
    # shards — identical printed losses prove the collective actually ran.
    rng = np.random.default_rng(100 + pid)
    radial = np.zeros((per_host, 32, 32), np.float32)
    radial[:, 8:24, 8:24] = rng.uniform(1, 3, size=(per_host, 16, 16))
    batch = {
        "image": rng.normal(size=(per_host, 32, 32, 3)).astype(np.float32),
        "radial": radial,
        "sem": np.where(radial > 0, 1.0, -1.0).astype(np.float32),
    }
    gbatch = parallel.shard_batch(mesh, batch)
    assert gbatch["image"].shape[0] == per_host * nprocs
    # AOT-compile BEFORE the first collective, then rendezvous at the
    # coordination-service barrier (NOT a gloo collective): Gloo's
    # cross-process context init has a fixed ~30 s key-value deadline, and
    # on a single-core machine the two workers' compiles can skew past it.
    # After this barrier both workers enter the collective within
    # milliseconds of each other.
    compiled = p_train.lower(state, gbatch).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("rcvpose_compiled", 600_000)
    state, m = compiled(state, gbatch)
    loss = float(m["loss"])
    print(f"MULTIHOST pid={pid} loss={loss:.6f}", flush=True)
    jax.distributed.shutdown()


def full_worker(pid, nprocs, port, tree, out):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=True, repo_root=REPO)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.device_count() == nprocs * DEV_PER_PROC

    from rcvpose_tpu import cli
    from rcvpose_tpu.config import Config

    # per-host batch 1 on the 3-frame fixture: each host's train loader
    # shards to 1 frame/epoch (floor(3/2)), mesh auto-fits to 2 devices —
    # ONE CHIP FROM EACH PROCESS (the regression this smoke pins down:
    # a prefix mesh would sit entirely on host 0).
    cfg = Config(root_dataset=tree, class_name="toy", batch_size=1,
                 max_iterations=2, model_blocks="1,1,1,1", model_width=0.125,
                 compute_dtype="float32", image_height=32, image_width=64,
                 out_dir=out, seed=3)
    trainer = cli.run_train(cfg)
    assert trainer.mesh.devices.size == nprocs, (
        f"mesh should span one chip per process, got "
        f"{trainer.mesh.devices.size}")
    procs = {d.process_index for d in trainer.mesh.devices.flat}
    assert procs == set(range(nprocs)), f"mesh covers processes {procs}"
    print(f"MULTIHOST_FULL pid={pid} iter={trainer.iteration} "
          f"best={trainer.best_val:.6f}", flush=True)
    jax.distributed.shutdown()


def _attempt():
    import socket

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(pid), str(N_PROCS), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(N_PROCS)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out)
            return None, f"worker {pid} failed rc={p.returncode}"
        line = next(ln for ln in out.splitlines() if "MULTIHOST" in ln)
        losses.append(float(line.split("loss=")[1]))
    return losses, None


def _attempt_full(tree, out):
    import socket

    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "fullworker",
             str(pid), str(N_PROCS), str(port), tree, out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(N_PROCS)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    bests = []
    for pid, (p, out_txt) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(out_txt)
            return None, f"worker {pid} failed rc={p.returncode}"
        line = next(ln for ln in out_txt.splitlines()
                    if "MULTIHOST_FULL" in ln)
        assert "iter=2" in line, line
        bests.append(float(line.split("best=")[1]))
    return bests, None


def main_full():
    import pathlib
    import tempfile

    import numpy as np

    from tests.test_data import make_linemod_tree

    with tempfile.TemporaryDirectory() as tmp:
        tree = make_linemod_tree(pathlib.Path(tmp),
                                 np.random.default_rng(0),
                                 h=32, w=64)  # FCN needs H, W % 32 == 0
        out = os.path.join(tmp, "out")
        err = None
        for attempt in range(3):  # see main(): gloo init deadline vs
            bests, err = _attempt_full(tree, out)  # cold-compile skew
            if bests is not None:
                break
            print(f"attempt {attempt + 1} failed ({err}); retrying with a "
                  "warm compile cache")
        if bests is None:
            raise SystemExit(err)
        assert abs(bests[0] - bests[1]) < 1e-6, (
            f"hosts disagree on best val loss: {bests}")
        ckpts = os.path.join(out, "lm", "toyKp1", "ckpts")
        for name in ("ckpt", "model_best"):
            assert os.path.isdir(os.path.join(ckpts, name)), (
                f"missing coordinated checkpoint {name} in {ckpts}")
    print(f"multihost_smoke --full: {N_PROCS}-process cli.run_train, "
          f"sharded loaders + cross-process mesh + coordinated orbax "
          f"checkpoints, best val {bests[0]:.6f} identical on every host")


def main():
    # Up to 3 attempts: Gloo's cross-process collective init has a fixed
    # ~30 s key-value deadline, and on a single-core machine the two
    # workers' train-step compiles can skew past it when anything else
    # contends for the core. A failed attempt still writes the persistent
    # compile cache (the faster worker finishes compiling), so the retry
    # compiles in seconds on both sides and the skew vanishes. This is a
    # harness-environment concern, not a property of the DP code.
    err = None
    for attempt in range(3):
        losses, err = _attempt()
        if losses is not None:
            break
        print(f"attempt {attempt + 1} failed ({err}); retrying with a "
              "warm compile cache")
    if losses is None:
        raise SystemExit(err)
    assert all(ls == ls for ls in losses), f"NaN loss: {losses}"
    assert abs(losses[0] - losses[1]) < 1e-6, (
        f"hosts disagree: {losses} — the global collective did not run")
    print(f"multihost_smoke: {N_PROCS} processes x {DEV_PER_PROC} devices, "
          f"global train step loss {losses[0]:.6f} identical on every host")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif len(sys.argv) > 1 and sys.argv[1] == "fullworker":
        full_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                    sys.argv[5], sys.argv[6])
    elif "--full" in sys.argv[1:]:
        main_full()
    else:
        main()
