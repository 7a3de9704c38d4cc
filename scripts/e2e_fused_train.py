"""Shared fused-net training recipe for the learned-evaluator e2e proofs.

Used by scripts/e2e_ycb_tpu.py and scripts/e2e_lmo_tpu.py: generate GT
labels with the production label op, train ONE fused multi-head net
(kpt_heads=3) with the production pjit Trainer, validate, and
orbax-checkpoint where ``--mode test`` looks (eval._load_models).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def setup_jax(small):
    """Pin the CPU backend for ``--small`` smokes and point the persistent
    compilation cache at the repo's ``.jax_cache/`` (shared by every e2e
    proof script)."""
    import jax

    if small:
        jax.config.update("jax_platforms", "cpu")
    from rcvpose_tpu.utils import setup_script_cache
    setup_script_cache(cpu=small)


def per_kpt_max_radii_dm(cad_m, keypoints_m):
    """Per-keypoint radius clips for keypoints 1..3, in decimeters
    (the reference's max CAD-vertex distance x10, rmap_dataset.py:53-56)."""
    return np.array([
        np.linalg.norm(cad_m - keypoints_m[i + 1], axis=1).max() * 10.0
        for i in range(3)], np.float32)


def train_fused_checkpoint(cfg, images, depths, poses, keypoints_m,
                           max_radii_dm, k, n_train, ckpt_dir):
    """Train on the first ``n_train`` frames and checkpoint to ``ckpt_dir``.

    ``keypoints_m`` rows 1..3 are the trained keypoints (the reference's
    Outside9 convention, rmap_dataset.py:43-51). Model depth/width come
    from ``cfg.model_blocks``/``cfg.model_width`` (train.build_model).
    Returns (iteration, val).
    """
    import jax
    import jax.numpy as jnp

    from rcvpose_tpu import labels, parallel
    from rcvpose_tpu import train as train_mod
    from rcvpose_tpu.checkpoint import Checkpointer

    batch = cfg.batch_size
    steps = cfg.max_iterations
    if n_train % batch:
        # train_batches drops the tail and max_epochs assumes it doesn't;
        # a non-multiple would silently undertrain (or train zero steps)
        raise ValueError(f"n_train={n_train} must be a multiple of the "
                         f"batch size {batch}")
    mesh = parallel.data_mesh(1)
    p_steps = train_mod.make_parallel_steps(mesh)

    label_fn = jax.jit(jax.vmap(
        lambda d, p, kp, mr: labels.radial_labels(
            d, (d > 0).astype(np.float32), p, kp, jnp.asarray(k), mr),
        in_axes=(0, 0, None, None)))
    images_norm = np.asarray(
        jax.jit(jax.vmap(labels.normalize_image))(images[:n_train]))
    depths_j = jnp.asarray(depths[:n_train])
    poses_j = jnp.asarray(poses[:n_train], jnp.float32)
    per = [np.asarray(a) for i in range(3)
           for a in label_fn(depths_j, poses_j,
                             jnp.asarray(keypoints_m[i + 1], jnp.float32),
                             jnp.float32(max_radii_dm[i]))]
    radial_all = np.stack(per[0::2], axis=-1)
    sem_all = np.stack(per[1::2], axis=-1)

    state = train_mod.create_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=n_train // batch,
        sample_shape=(1, 64, 64, 3))

    def train_batches(epoch):
        order = np.random.default_rng(epoch * 7).permutation(n_train)
        for s in range(0, n_train - batch + 1, batch):
            idx = order[s:s + batch]
            yield {"image": jnp.asarray(images_norm[idx]),
                   "radial": jnp.asarray(radial_all[idx]),
                   "sem": jnp.asarray(sem_all[idx])}

    def val_batches():
        yield {"image": jnp.asarray(images_norm[:batch]),
               "radial": jnp.asarray(radial_all[:batch]),
               "sem": jnp.asarray(sem_all[:batch])}

    ckpt = Checkpointer(ckpt_dir)
    trainer = train_mod.Trainer(
        cfg=cfg, state=state, mesh=mesh, train_batches=train_batches,
        val_batches=val_batches, checkpointer=None, steps=p_steps)
    t0 = time.time()
    max_epochs = -(-steps * batch // n_train)
    trainer.fit(max_epochs=max_epochs)
    val = trainer.validate(max_epochs)
    print(f"fused: {trainer.iteration} steps in {time.time() - t0:.1f} s, "
          f"val loss {val:.4f}", file=sys.stderr)
    ckpt.save(trainer.state, epoch=max_epochs, iteration=trainer.iteration,
              best_val=val, is_best=False)
    # async save: the caller restores this directory next — drain first
    ckpt.wait_until_finished()
    return trainer.iteration, val
