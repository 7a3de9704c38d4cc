"""Batching + background prefetch, replacing torch DataLoader(num_workers=1).

Host threads read and stack raw frames; GT label generation runs *on device*
as one vmapped jit program per batch (the SURVEY.md §2.2 north star: the
reference burns CPU in a Numba scatter per sample inside the DataLoader
worker — here the TPU does it as dense elementwise math fused with the
normalize step).
"""

from __future__ import annotations

import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from rcvpose_tpu import labels


def _stack_raw(samples):
    if "radial_dm" in samples[0]:  # precomputed labels (YCB HDF5 path)
        return {
            "image": np.stack([s["image"] for s in samples]),
            "radial_dm": np.stack([s["radial_dm"] for s in samples]),
        }
    return {
        "image": np.stack([s["image"] for s in samples]),
        "depth": np.stack([s["depth"] for s in samples]).astype(np.float32),
        "mask": np.stack([s["mask"] for s in samples]),
        "pose": np.stack([s["pose"] for s in samples]).astype(np.float32),
    }


class BatchLoader:
    """Iterable of device-ready batches {image, radial, sem}."""

    def __init__(self, dataset, k, batch_size, shuffle=True, seed=0,
                 prefetch=2, drop_last=True, ycb_clip=False, kpt_heads=1,
                 shard_rank=0, shard_count=1):
        """``kpt_heads > 1`` emits multi-head labels (B, H, W, K) — one
        radial/sem pair per keypoint (rows 1..K of the dataset's keypoint
        array, the same rows the reference eval consumes) — for training
        the fused multi-head model (config ``kpt_heads``).

        ``shard_rank/shard_count``: multi-host data sharding. Every process
        derives the SAME per-epoch permutation purely from ``(seed, epoch)``
        (``_index_order`` — stateless, which is what the index-level
        mid-epoch resume relies on), then takes the disjoint
        ``rank::count`` slice, trimmed to a
        common length so every process yields the same number of batches
        (processes must dispatch the same collectives). Without this, all
        hosts of a multi-host run would feed identical frames and the
        global batch would duplicate data instead of sharding it."""
        if not (0 <= shard_rank < shard_count):
            raise ValueError(f"shard_rank {shard_rank} not in "
                             f"[0, {shard_count})")
        self.ds = dataset
        self.k = np.asarray(k, np.float32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._auto_epoch = 0  # epoch counter for bare iter() calls
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.ycb_clip = ycb_clip
        self.kpt_heads = kpt_heads
        self.shard_rank = shard_rank
        self.shard_count = shard_count

        has_geometry = hasattr(dataset, "kpt")
        multi = kpt_heads > 1
        # Multi-head labels come from either route: on-the-fly generation
        # (datasets with keypoint geometry — LINEMOD) or stacking the
        # dataset's per-keypoint precomputed maps (YCB HDF5 stores
        # 3Dradius_pt1..K_dm already; YcbDataset.raw_multi). So the fused
        # model (kpt_heads > 1) trains on every dataset the reference
        # covers.
        self._multi_precomputed = (multi and not hasattr(dataset, "keypoints")
                                   and hasattr(dataset, "raw_multi"))
        if multi and not hasattr(dataset, "keypoints") \
                and not self._multi_precomputed:
            raise ValueError(
                "kpt_heads > 1 needs a dataset with either a keypoints "
                "array (on-the-fly label route) or per-keypoint "
                "precomputed maps (raw_multi — the YCB HDF5 route)")
        if multi and not self._multi_precomputed:
            kpt = jnp.asarray(dataset.keypoints[1:1 + kpt_heads],
                              jnp.float32)               # (K, 3)
            maxr = jnp.asarray(
                dataset.max_radii_for(range(1, 1 + kpt_heads)), jnp.float32)
        else:
            kpt = (jnp.asarray(self.ds.kpt, jnp.float32) if has_geometry
                   else jnp.zeros(3, jnp.float32))
            maxr = (jnp.float32(self.ds.max_radii_dm) if has_geometry
                    else jnp.float32(0.0))
        kmat = jnp.asarray(self.k)
        clip = ycb_clip

        multi_otf = multi and not self._multi_precomputed

        @jax.jit
        def transform_batch(image, depth, mask, pose):
            def one(img, dep, msk, pse):
                im = labels.normalize_image(img)
                if multi_otf:
                    radial, sem = jax.vmap(
                        lambda kp, mr: labels.radial_labels(
                            dep, msk, pse, kp, kmat, mr, ycb_clip=clip),
                        out_axes=-1)(kpt, maxr)          # (H, W, K)
                else:
                    radial, sem = labels.radial_labels(
                        dep, msk, pse, kpt, kmat, maxr, ycb_clip=clip)
                return im, radial, sem
            im, radial, sem = jax.vmap(one)(image, depth, mask, pose)
            # even-crop (reference data_loader.py:97-101)
            h = im.shape[1] - im.shape[1] % 2
            w = im.shape[2] - im.shape[2] % 2
            return {"image": im[:, :h, :w], "radial": radial[:, :h, :w],
                    "sem": sem[:, :h, :w]}

        @jax.jit
        def transform_precomputed(image, radial_dm):
            im = jax.vmap(labels.normalize_image)(image)
            radial = jnp.asarray(radial_dm, jnp.float32)
            if clip:
                radial = jnp.where(radial >= 10.0, 0.0, radial)
            sem = jnp.where(radial > 0, 1.0, -1.0).astype(jnp.float32)
            h = im.shape[1] - im.shape[1] % 2
            w = im.shape[2] - im.shape[2] % 2
            return {"image": im[:, :h, :w], "radial": radial[:, :h, :w],
                    "sem": sem[:, :h, :w]}

        self._transform = transform_batch
        self._transform_precomputed = transform_precomputed

    def _shard_len(self):
        # floor(n / count) for EVERY rank: uniform step counts across hosts
        return len(self.ds) // self.shard_count if self.shard_count > 1 \
            else len(self.ds)

    def __len__(self):
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_order(self, epoch=0):
        """Epoch ``epoch``'s sample permutation — a pure function of
        ``(seed, epoch)``, so a resumed run replays the exact batch
        sequence of the unbroken one and every multi-host process draws
        the same permutation without shared rng state."""
        idx = np.arange(len(self.ds))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        if self.shard_count > 1:
            idx = idx[self.shard_rank::self.shard_count][:self._shard_len()]
        return idx

    def __iter__(self):
        epoch = self._auto_epoch
        self._auto_epoch += 1
        return self.batches(epoch)

    def batches(self, epoch, start_batch=0):
        """Epoch ``epoch``'s device-ready batches, starting at batch index
        ``start_batch``. The skipped prefix is never read from the dataset
        nor transformed — the index-level mid-epoch resume fast-forward
        (a consumed-then-discarded skip would pay the host read + device
        transform for every skipped batch; at reference scale, most of an
        epoch of work)."""
        order = self._index_order(epoch)
        nb = len(self)
        start_batch = min(max(start_batch, 0), nb)
        q = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in range(start_batch, nb):
                    sel = order[b * self.batch_size:(b + 1) * self.batch_size]
                    if self._multi_precomputed:
                        samples = [self.ds.raw_multi(int(i), self.kpt_heads)
                                   for i in sel]
                    elif hasattr(self.ds, "raw_batch"):
                        samples = self.ds.raw_batch(sel)
                    else:
                        samples = [self.ds.raw(int(i)) for i in sel]
                    q.put(_stack_raw(samples))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        def transform(item):
            if "radial_dm" in item:
                return self._transform_precomputed(item["image"],
                                                   item["radial_dm"])
            return self._transform(item["image"], item["depth"],
                                   item["mask"], item["pose"])

        # Device double-buffering: dispatch batch k+1's (async) host->device
        # transfer + jit transform BEFORE yielding batch k, so the transform
        # and copy of the next batch overlap the consumer's train step.
        pending = None
        while True:
            item = q.get()
            if item is stop:
                break
            nxt = transform(item)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending


def make_loaders(cfg, dataset_cls=None, shard_rank=None, shard_count=None):
    """(train_loader, val_loader) — both on the 'val' split by default, as
    the reference does (data_loader.py:123).

    Multi-host: the TRAIN loader shards the dataset across processes
    (disjoint ``process_index::process_count`` slices of one common
    permutation) so the global batch covers distinct frames. The VAL
    loader deliberately stays full-set on every host: each process then
    computes identical validation metrics and makes the identical
    best-checkpoint decision (no cross-host metric reduction needed).
    """
    import jax

    from rcvpose_tpu import geometry
    from rcvpose_tpu.data.dataset import LinemodDataset, YcbDataset

    if shard_rank is None:
        shard_rank = jax.process_index()
    if shard_count is None:
        shard_count = jax.process_count()
    if dataset_cls is None:
        dataset_cls = LinemodDataset if cfg.dataset == "lm" else YcbDataset
    train_ds = dataset_cls(cfg.root_dataset, cfg.class_name,
                           kpt_num=cfg.kpt_num, split="val")
    val_ds = dataset_cls(cfg.root_dataset, cfg.class_name,
                         kpt_num=cfg.kpt_num, split="val")
    k = geometry.LINEMOD_K
    ycb = cfg.dataset != "lm"
    heads = getattr(cfg, "kpt_heads", 1)
    train = BatchLoader(train_ds, k, cfg.batch_size, shuffle=True,
                        seed=cfg.seed, prefetch=cfg.num_prefetch,
                        ycb_clip=ycb, kpt_heads=heads,
                        shard_rank=shard_rank, shard_count=shard_count)
    val = BatchLoader(val_ds, k, cfg.batch_size, shuffle=False,
                      seed=cfg.seed, prefetch=cfg.num_prefetch, ycb_clip=ycb,
                      kpt_heads=heads)
    return train, val
