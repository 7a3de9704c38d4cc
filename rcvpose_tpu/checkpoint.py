"""Checkpointing: orbax save/restore + torch-checkpoint importer.

Replaces the reference's ``torch.save`` dict / ``utils.load_checkpoint``
(``/root/reference/train.py:118-131``, ``utils.py:39-54``) with orbax. The
saved payload carries the same information: params (model_state_dict),
opt_state (optim_state_dict), step/epoch, best validation score. Unlike the
reference, resume actually resumes (the reference resets ``self.epoch = 0``
right after restoring — train.py:50).

``import_torch_checkpoint`` maps a reference ``.pth.tar`` state dict onto the
Flax parameter tree so pretrained reference weights can drive the TPU eval
pipeline (numerical-parity bridge; reference ckpt layout documented at
AccumulatorSpace.py:520-530).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Orbax-backed ckpt/best-ckpt pair (reference 'ckpt.pth.tar' +
    'model_best.pth.tar' convention, train.py:118-131).

    Saves are ASYNC by default (orbax ``AsyncCheckpointer``): ``save``
    returns once the device arrays are snapshotted to host memory, and the
    ~0.5 GB disk write streams in a background thread while training
    continues — the reference (and the round-4 build) stalled every
    validation on the full write. ``save`` first waits out any still-
    running previous save (by the next validation it has long finished),
    ``restore`` waits before reading, ``Trainer.fit`` waits before
    returning so a finished run never has a write in flight, and a
    GC finalizer drains in-flight writes when the wrapper dies (so the
    one-shot ``Checkpointer(d).save(...)`` idiom is safe). Handing the
    directory to ANOTHER reader (a fresh Checkpointer, the eval's
    ``_orbax_variables``) while this instance is alive still requires an
    explicit ``wait_until_finished()`` first. Snapshotting
    also makes the donated train-step buffers safe: the next step may
    overwrite the device arrays freely. ``async_save=False`` restores the
    fully synchronous behavior (measured stall delta in PERF.md
    "Train-loop host syncs")."""

    def __init__(self, directory, async_save=True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # both modes wrap the SAME handler so save/restore signatures
        # (args=ocp.args.Standard*) are uniform; StandardCheckpointer's
        # own save() takes the pytree positionally and would break the
        # sync branch
        self._ckpt = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                      if async_save
                      else ocp.Checkpointer(ocp.StandardCheckpointHandler()))
        # model_best gets its OWN async checkpointer: dispatching it on
        # self._ckpt would require waiting out the just-dispatched ckpt
        # write first, reintroducing the full synchronous stall on every
        # best-improving validation (early training improves almost every
        # time). Two checkpointers snapshot the payload independently, so
        # both writes overlap training.
        self._ckpt_best = (
            ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
            if async_save else self._ckpt)
        # Drain in-flight writes when this wrapper is collected: the
        # one-shot ``Checkpointer(d).save(...)`` pattern otherwise tears
        # down the async machinery mid-commit at GC (observed as a
        # truncated checkpoint + "cannot schedule new futures after
        # shutdown" from the commit thread). The finalizer holds the orbax
        # object, not ``self``, so it cannot keep the wrapper alive.
        import weakref
        weakref.finalize(self, Checkpointer._drain, self._ckpt,
                         self._ckpt_best)

    @staticmethod
    def _drain(*ckpts):
        for ckpt in ckpts:
            try:
                if hasattr(ckpt, "wait_until_finished"):
                    ckpt.wait_until_finished()
            except Exception:
                pass  # never raise during GC/interpreter shutdown

    def _payload(self, state, epoch, iteration, best_val):
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
            "iteration": np.asarray(iteration),
            "best_val": np.asarray(best_val),
        }

    def wait_until_finished(self):
        """Block until every dispatched save (ckpt AND model_best) has
        committed to disk (no-op in sync mode — ocp.Checkpointer has no
        async machinery)."""
        for ckpt in (self._ckpt, self._ckpt_best):
            if hasattr(ckpt, "wait_until_finished"):
                ckpt.wait_until_finished()

    def save(self, state, epoch, iteration, best_val, is_best=False):
        payload = self._payload(state, epoch, iteration, best_val)
        # serialize with the PREVIOUS saves (long done by the next
        # validation); the saves dispatched below then overlap training
        self.wait_until_finished()
        path = os.path.join(self.directory, "ckpt")
        self._ckpt.save(path, args=ocp.args.StandardSave(payload),
                        force=True)
        if is_best:
            # separate checkpointer: no wait on the ckpt write above —
            # both snapshots were taken from the same host payload
            best = os.path.join(self.directory, "model_best")
            self._ckpt_best.save(best, args=ocp.args.StandardSave(payload),
                                 force=True)

    def restore(self, state, best=False):
        """Returns (state, epoch, iteration, best_val)."""
        self.wait_until_finished()  # an in-flight save of this dir
        name = "model_best" if best else "ckpt"
        path = os.path.join(self.directory, name)
        template = self._payload(state, 0, 0, float("inf"))
        payload = self._ckpt.restore(
            path, args=ocp.args.StandardRestore(template))
        new_state = state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=int(payload["step"]),
        )
        return (new_state, int(payload["epoch"]), int(payload["iteration"]),
                float(payload["best_val"]))


# ---------------------------------------------------------------------------
# Torch -> Flax weight import
# ---------------------------------------------------------------------------

def _conv_w(t):
    # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_key_to_flax(key):
    """Map one reference state-dict key to (collection, flax path).

    Reference module names (models/fcnresnet.py): conv1/bn1, block{s}up,
    block{s}.{i} (Sequential), conv6/bn6, conv_up{k}.{0,1} (Sequential of
    conv+bn), conv7.{0,1}, conv8, and bottleneck-internal conv1..3/bn1..3 +
    upsample_.{0,1} (the projection shortcut). DataParallel prefixes
    'module.' (README.md:52).
    """
    key = re.sub(r"^module\.", "", key)
    parts = key.split(".")

    def leaf(pname):
        return {
            "weight": ("params", "kernel"), "bias": ("params", "bias"),
        }[pname]

    def bn_leaf(pname):
        return {
            "weight": ("params", "scale"), "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var"),
        }.get(pname)

    def bottleneck_member(member, pname, prefix):
        # member in conv1..conv3, bn1..bn3, upsample_
        if member.startswith("conv"):
            col, l = leaf(pname)
            return col, prefix + [member, l]
        if member.startswith("bn"):
            m = bn_leaf(pname)
            if m is None:
                return None
            return m[0], prefix + [member, m[1]]
        return None  # e.g. num_batches_tracked

    head = parts[0]
    # encoder stem
    if head == "conv1":
        col, l = leaf(parts[1])
        return col, ["encoder", "conv1", l]
    if head == "bn1":
        m = bn_leaf(parts[1])
        return (m[0], ["encoder", "bn1", m[1]]) if m else None
    # encoder stages
    m_up = re.match(r"block(\d)up$", head)
    if m_up:
        member = parts[1]
        if member == "upsample_":
            sub = parts[2]  # '0' conv, '1' bn
            pname = parts[3]
            if sub == "0":
                col, l = leaf(pname)
                return col, ["encoder", head, "proj_conv", l]
            m = bn_leaf(pname)
            return (m[0], ["encoder", head, "proj_bn", m[1]]) if m else None
        return bottleneck_member(member, parts[2], ["encoder", head])
    m_blk = re.match(r"block(\d)$", head)
    if m_blk:
        idx = int(parts[1]) + 1  # Sequential index 0 -> our _1
        name = f"block{m_blk.group(1)}_{idx}"
        return bottleneck_member(parts[2], parts[3], ["encoder", name])
    # neck + decoder
    if head == "conv6":
        col, l = leaf(parts[1])
        return col, ["conv6", l]
    if head == "bn6":
        m = bn_leaf(parts[1])
        return (m[0], ["bn6", m[1]]) if m else None
    m_seq = re.match(r"(conv_up\d|conv7)$", head)
    if m_seq:
        sub, pname = parts[1], parts[2]
        if sub == "0":
            col, l = leaf(pname)
            return col, [head + "_conv", l]
        m = bn_leaf(pname)
        return (m[0], [head + "_bn", m[1]]) if m else None
    m_lift = re.match(r"conv_up\d_1$", head)
    if m_lift:
        col, l = leaf(parts[1])
        return col, [head, l]
    if head == "conv8":
        col, l = leaf(parts[1])
        return col, ["conv8", l]
    return None


def import_torch_state_dict(state_dict):
    """Reference state dict (tensor-like values) -> {'params':..,
    'batch_stats':..} nested dicts matching the Flax models."""
    out = {"params": {}, "batch_stats": {}}
    for key, tensor in state_dict.items():
        mapped = torch_key_to_flax(key)
        if mapped is None:
            continue
        col, path = mapped
        arr = np.asarray(tensor)
        if path[-1] == "kernel":
            arr = _conv_w(arr)
        _set(out[col], path, arr)
    return out


def export_torch_state_dict(variables, template_keys):
    """Inverse bridge: Flax variables -> reference-format torch state dict.

    ``template_keys``: iterable of reference parameter names (e.g.
    ``torch_model.state_dict().keys()``) defining the target layout; each is
    resolved through the same ``torch_key_to_flax`` mapping the importer
    uses, so the two directions cannot drift apart. Skipped keys: ones that
    carry no weights (``num_batches_tracked``) and *dead* reference
    parameters (the reference Bottleneck always allocates ``upsample_``
    projection weights but only projecting blocks use them —
    /root/reference/models/fcnresnet.py:16-18, 35-36 — so non-projecting
    blocks have no Flax counterpart). Load with ``strict=False``; the
    skipped entries never influence the reference forward pass. Conv
    kernels are transposed back HWIO -> OIHW. Lets models trained in this
    framework be consumed by the reference PyTorch code (the reverse of
    ``import_torch_checkpoint``)."""
    tree = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})}
    out = {}
    for key in template_keys:
        mapped = torch_key_to_flax(key)
        if mapped is None:
            continue
        col, path = mapped
        node = tree[col]
        try:
            for p in path:
                node = node[p]
        except KeyError:
            # Only the known-dead reference params may be absent: the
            # reference Bottleneck always allocates 'upsample_' projection
            # weights but non-projecting blocks never use them
            # (/root/reference/models/fcnresnet.py:16-18, 35-36). Any other
            # unresolved key means the Flax variables come from a mismatched
            # architecture (width-scaled, shallow blocks, kpt_heads > 1) —
            # fail loudly instead of emitting a partial state dict that
            # load_state_dict(strict=False) would silently accept.
            if "upsample_" in key:
                continue
            raise KeyError(
                f"torch key {key!r} (flax path {col}/{'/'.join(path)}) has "
                "no counterpart in the given variables — the architecture "
                "does not match the reference model (check model_blocks/"
                "model_width/kpt_heads)")
        arr = np.asarray(node)
        if path[-1] == "kernel":
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> torch OIHW
        out[key] = arr
    return out


def _flax_path_to_torch_key(col, path):
    """Inverse of ``torch_key_to_flax`` for one (collection, path) pair.

    Covers every parameter the Flax models allocate (reference module
    naming: models/fcnresnet.py — conv1/bn1, block{s}up(+upsample_ proj),
    block{s}.{i} Sequentials, conv6/bn6, conv_up{k}.{0,1}, conv_up{k}_1
    lifts, conv7.{0,1}, conv8)."""
    leaf = path[-1]
    conv_leaf = {"kernel": "weight", "bias": "bias"}
    bn_leaf = {"scale": "weight", "bias": "bias",
               "mean": "running_mean", "var": "running_var"}
    lmap = bn_leaf if col == "batch_stats" else conv_leaf

    def bn_or_conv(module):
        is_bn = (col == "batch_stats" or module.startswith("bn")
                 or module.endswith("_bn") or module == "proj_bn")
        return (bn_leaf if is_bn else conv_leaf)[leaf]

    if path[0] == "encoder":
        mod = path[1]
        if mod in ("conv1", "bn1"):
            return f"{mod}.{bn_or_conv(mod)}"
        m_up = re.match(r"block(\d)up$", mod)
        if m_up:
            member = path[2]
            if member == "proj_conv":
                return f"{mod}.upsample_.0.{conv_leaf[leaf]}"
            if member == "proj_bn":
                return f"{mod}.upsample_.1.{bn_leaf[leaf]}"
            return f"{mod}.{member}.{bn_or_conv(member)}"
        m_blk = re.match(r"block(\d)_(\d+)$", mod)
        if m_blk:
            member = path[2]
            seq = int(m_blk.group(2)) - 1  # our _1 -> Sequential index 0
            return (f"block{m_blk.group(1)}.{seq}.{member}."
                    f"{bn_or_conv(member)}")
        raise KeyError(f"unmapped encoder module {mod!r}")
    mod = path[0]
    if mod in ("conv6", "bn6", "conv8"):
        return f"{mod}.{bn_or_conv(mod)}"
    m_seq = re.match(r"(conv_up\d|conv7)_(conv|bn)$", mod)
    if m_seq:
        idx = 0 if m_seq.group(2) == "conv" else 1
        return f"{m_seq.group(1)}.{idx}.{bn_or_conv(mod)}"
    if re.match(r"conv_up\d_1$", mod):
        return f"{mod}.{lmap[leaf]}"
    raise KeyError(f"unmapped module path {'/'.join(path)!r}")


def reference_state_dict_keys(variables):
    """Torch state-dict keys for these Flax variables, in reference layout.

    Derived from the variable tree itself (no torch model needed) and
    self-checked: every generated key must map back to its source path via
    ``torch_key_to_flax``, so this inverse and the importer cannot drift.
    Feed the result to ``export_torch_state_dict`` to emit a checkpoint the
    reference's ``load_state_dict(strict=False)`` consumes directly.
    """
    keys = []
    for col in ("params", "batch_stats"):
        tree = variables.get(col, {})
        for path_t, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
            path = [getattr(p, "key", getattr(p, "name", None))
                    for p in path_t]
            key = _flax_path_to_torch_key(col, path)
            back = torch_key_to_flax(key)
            assert back == (col, path), (
                f"inverse mapping drift: {key!r} -> {back} != "
                f"({col}, {path})")
            keys.append(key)
    return keys


def export_torch_checkpoint(variables, path, epoch=0, iteration=0,
                            extra=None):
    """Write Flax variables as a reference-format ``.pth.tar``.

    The payload mirrors the reference Trainer's checkpoint dict
    (train.py:118-128: model_state_dict + bookkeeping); tensors are torch
    CPU tensors so ``torch.load`` + ``load_state_dict(strict=False)`` work
    in an unmodified reference environment."""
    import torch

    keys = reference_state_dict_keys(variables)
    sd = export_torch_state_dict(variables, keys)
    payload = {
        "model_state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                             for k, v in sd.items()},
        "epoch": int(epoch),
        "iteration": int(iteration),
        "arch": "DenseFCNResNet152",
    }
    if extra:
        payload.update(extra)
    torch.save(payload, path)
    return path


def import_torch_checkpoint(path):
    """Load a reference .pth.tar and return Flax variables. The payload is a
    dict with 'model_state_dict' (train.py:118-128) or a bare state dict."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("model_state_dict", payload) if isinstance(payload, dict) \
        else payload
    return import_torch_state_dict({k: v.numpy() for k, v in sd.items()})
