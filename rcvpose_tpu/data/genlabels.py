"""Offline GT radial-map generation (optional precompute path).

Equivalent of the reference's standalone generators —
``/root/reference/3DRadius_lm.py:126-234`` (per class x keypoint x frame,
saves ``Out_pt<k>_dm/<id>.npy`` in decimeters) and ``3DRadius_ycb.py:164-286``
(gzip HDF5 datasets ``3Dradius_pt<k>_dm/<cycle>_<frame>``) — except the math
runs as one vmapped jit program per batch of frames on the accelerator
instead of a Numba scatter per frame on the host (and without the
reference's blocking ``plt.show`` per frame, 3DRadius_lm.py:202-203).

Note the framework does not *require* precomputed labels: the training
loader generates them on the fly on device (reference parity:
README.md:11 says the same of its Numba path).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rcvpose_tpu import geometry, labels
from rcvpose_tpu.data.dataset import LinemodDataset


def generate_lm(root, class_name, kpt_indices=range(1, 4), split="val",
                out_root=None, batch_size=8, progress=print,
                fake_depth=False):
    """Write Out_pt<k>_dm/<id>.npy radial maps for one LINEMOD class.

    ``fake_depth=True`` is the reference's ``depthGeneration`` mode
    (3DRadius_lm.py:14, 152-153, 213-214): the same per-pixel
    keypoint-distance maps, saved METER-valued (no x10) under ``FakeDepth/``
    — the pseudo-depth input of the RGB-only ablation.
    """
    out_root = out_root or os.path.join(root, class_name)
    k = jnp.asarray(geometry.LINEMOD_K, jnp.float32)

    for kpt_num in kpt_indices:
        ds = LinemodDataset(root, class_name, kpt_num=kpt_num, split=split)
        out_dir = os.path.join(
            out_root, "FakeDepth" if fake_depth else f"Out_pt{kpt_num}_dm")
        os.makedirs(out_dir, exist_ok=True)
        kpt = jnp.asarray(ds.kpt, jnp.float32)
        maxr = jnp.float32(ds.max_radii_dm)

        @jax.jit
        def batch_labels(depth, mask, pose):
            def one(d, m, p):
                radial, _ = labels.radial_labels(d, m, p, kpt, k, maxr)
                return radial
            return jax.vmap(one)(depth, mask, pose)

        for start in range(0, len(ds), batch_size):
            idx = range(start, min(start + batch_size, len(ds)))
            samples = [ds.raw(i) for i in idx]
            depth = jnp.asarray(
                np.stack([s["depth"] for s in samples]).astype(np.float32))
            mask = jnp.asarray(np.stack([s["mask"] for s in samples]))
            pose = jnp.asarray(
                np.stack([s["pose"] for s in samples]).astype(np.float32))
            radials = np.asarray(batch_labels(depth, mask, pose))
            if fake_depth:
                radials = radials / 10.0  # dm -> meters (reference :213)
            for s, r in zip(samples, radials):
                np.save(os.path.join(out_dir, f"{s['img_id']}.npy"), r)
            progress(f"{class_name} pt{kpt_num}: "
                     f"{min(start + batch_size, len(ds))}/{len(ds)}")


def generate_ycb(root, class_name, class_id, kpt_indices=range(1, 4),
                 batch_size=8, progress=print, write_split=True):
    """Write one YCB class's training HDF5 — the file its own consumers read.

    Output layout mirrors the reference generator (3DRadius_ycb.py:200-253),
    which writes BOTH the gzip'd RGB frames and the radial maps into the one
    per-class file the dataset then opens:

      <root>/<class>.hdf5            (YcbDataset, data/dataset.py; the YCB
        /JPEGImages/<cycle>_<idx>     evaluator's frame index, eval.py)
        /3Dradius_pt<k>_dm/<cycle>_<idx>

    Radial maps are raw decimeters like the reference's ``Radius3DMap*10``
    (no clip at generation; the >= 10 dm noise filter is the dataset
    transform's job, reference data_loader.py:107-108 = this framework's
    ``BatchLoader`` ``ycb_clip``).

    ``write_split=True`` additionally records the generated frame ids in
    ``<root>/<class>/Split/val.txt`` (read by ``YcbDataset`` /
    ``make_loaders``, reference rmap_dataset.py:64) AND
    ``<root>/Split/<class>/val.txt`` (read by the YCB evaluator, reference
    AccumulatorSpace.py:986) when missing, so ``--mode gen-labels``
    -> ``--mode train`` -> ``--mode test`` works with no manual step.
    Existing split files are never touched.
    """
    import h5py
    import scipy.io

    from rcvpose_tpu.data import readers

    keypoints = np.load(os.path.join(root, "models", class_name,
                                     "Outside9.npy"))

    h5_path = os.path.join(root, f"{class_name}.hdf5")
    data_root = os.path.join(root, "data")
    frame_ids = []
    inf = jnp.float32(np.inf)  # reference writes unclipped distances
    with h5py.File(h5_path, "a") as h5f:
        for cycle in sorted(os.listdir(data_root)):
            cdir = os.path.join(data_root, cycle)
            if not os.path.isdir(cdir):
                continue
            for fn in sorted(os.listdir(cdir)):
                if not fn.endswith(".mat"):
                    continue
                idx = fn[:-4]
                meta = scipy.io.loadmat(os.path.join(cdir, fn))
                sel = np.where(meta["cls_indexes"].ravel() == class_id)[0]
                if sel.size == 0:
                    continue
                pose = meta["poses"][:, :, sel[0]]
                factor = float(np.asarray(meta["factor_depth"]).ravel()[0])
                kmat = jnp.asarray(meta["intrinsic_matrix"], jnp.float32)
                depth = readers.read_depth(
                    os.path.join(cdir, f"{idx}-depth.png"))
                depth_mm = depth.astype(np.float32) / factor * 1000.0
                # label mask: per-object id in the label png
                seg = readers.read_depth(
                    os.path.join(cdir, f"{idx}-label.png"))
                mask = (seg == class_id).astype(np.int32)

                frame_id = f"{cycle}_{idx}"
                img_key = f"JPEGImages/{frame_id}"
                if img_key not in h5f:
                    image = readers.read_image(
                        os.path.join(cdir, f"{idx}-color.png"))
                    h5f.create_dataset(img_key, data=image,
                                       compression="gzip",
                                       compression_opts=9)
                for kpt_num in kpt_indices:
                    kpt = keypoints[kpt_num]
                    radial, _ = labels.radial_labels(
                        depth_mm, mask, jnp.asarray(pose, jnp.float32),
                        jnp.asarray(kpt, jnp.float32), kmat, inf)
                    key = f"3Dradius_pt{kpt_num}_dm/{frame_id}"
                    if key in h5f:
                        del h5f[key]
                    h5f.create_dataset(key, data=np.asarray(radial),
                                       compression="gzip",
                                       compression_opts=9)
                frame_ids.append(frame_id)
                progress(f"{class_name} {frame_id}")

    if write_split and frame_ids:
        # The reference reads TWO split layouts: the YCB dataset opens
        # <root>/<class>/Split/val.txt (rmap_dataset.py:64) while the YCB
        # evaluator opens <root>/Split/<class>/val.txt
        # (AccumulatorSpace.py:986) — write both so gen-labels feeds
        # --mode train AND --mode test without a manual copy.
        for split_path in (
                os.path.join(root, class_name, "Split", "val.txt"),
                os.path.join(root, "Split", class_name, "val.txt")):
            if not os.path.exists(split_path):
                os.makedirs(os.path.dirname(split_path), exist_ok=True)
                with open(split_path, "w") as f:
                    f.write("\n".join(frame_ids) + "\n")
    return frame_ids
