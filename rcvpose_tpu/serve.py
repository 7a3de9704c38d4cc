"""Network pose-serving daemon — the deployment surface of the framework.

The reference has no serving story: its evaluators are offline batch loops
(``AccumulatorSpace.py:564-662``). A production framework needs a long-lived
process on the accelerator host that keeps the compiled programs and weights
resident and answers pose queries over the wire. This module wraps
``infer.PoseEstimator`` (the compile-once, escalation-checked serving path)
behind a minimal length-prefixed TCP protocol with no dependencies beyond
the standard library.

Wire protocol (all lengths big-endian uint32; connections are persistent,
many requests per connection, FIFO):

  request  = [header_len][header JSON][payload bytes]
    {"op": "ping"}                                   -> no payload
    {"op": "pose", "h": H, "w": W,
     "icp": bool?, "icp_threshold_mm": float?,
     "icp_iters": int?}                              -> payload =
        H*W*3 uint8 RGB (row-major) ++ H*W float32 little-endian depth (mm)

  response = [len][JSON]
    ping  -> {"ok": true, "pong": true}
    pose  -> {"ok": true, "rt": [[..]x4] (mm), "centers": [[..]x3] (mm),
              "counts": [..], "overflow": [..], "ms": float,
              "icp_applied": bool, "device": int}
    error -> {"ok": false, "error": "..."}  (connection stays usable)

Each chip executes serially (one execution lock per device); concurrent
requests dispatch round-robin across every local chip via per-device
estimator replicas (see ``PoseServer`` — the multi-chip scale-out), and
``device`` in the reply says which chip served the request.
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import struct
import threading
import time

import numpy as np

_MAX_HEADER = 1 << 16
_MAX_PAYLOAD = 1 << 28  # 256 MB: a 4096x4096 RGB-D frame is ~117 MB


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------

def _recv_exact(sock, n):
    """Read exactly n bytes or raise ConnectionError on EOF."""
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


def _send_json(sock, obj):
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(data)) + data)


def _recv_json(sock, limit=_MAX_HEADER):
    (n,) = struct.unpack(">I", _recv_exact(sock, 4))
    if n > limit:
        raise ValueError(f"message of {n} bytes exceeds the {limit} limit")
    return json.loads(_recv_exact(sock, n))


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------

class _Pool:
    """One class's estimator replicas, indexed by device slot."""

    __slots__ = ("replicas", "building")

    def __init__(self, base):
        self.replicas = {0: base}   # device index -> PoseEstimator
        self.building = False       # a background replica build is running


class PoseServer:
    """Serve one or many classes' ``PoseEstimator``s over TCP.

    ``estimator`` is the default ``infer.PoseEstimator`` (weights already
    loaded), used when a pose request names no class; pass ``cad_mm`` to
    its constructor if clients will request ICP refinement. A deployment
    usually hosts several object classes (the reference evaluates 13):
    pass ``estimator_factory(class_name) -> PoseEstimator`` and pose
    requests may carry ``"class_name"`` — estimators are built lazily on
    first use and cached for the server's lifetime. Cold-class builds and
    first-compiles run OUTSIDE the chip execution locks, under a per-class
    build lock: a cold class's first request pays its own checkpoint load
    + compile (minutes on a cold cache), but concurrent traffic for
    already-warm classes keeps flowing — only the millisecond-scale device
    executions serialize. ``warm_classes`` pre-builds a class list before
    the socket opens (the ``--serve_classes`` CLI flag).

    **Multi-chip dispatch.** ``devices`` (default: every local device)
    is the scale-out set — the deployment analogue of the reference's one
    parallelism primitive, "use all local GPUs"
    (torch.nn.DataParallel, /root/reference/train.py:31-34). Execution
    serializes per CHIP (one ``threading.Lock`` per device, shared by all
    classes), not globally: concurrent requests dispatch round-robin to
    free chips, each served by a per-device ``PoseEstimator`` replica
    (weights ``device_put`` per chip — ``PoseEstimator.replicate_to``).
    Replicas beyond device 0 are built LAZILY, in a background thread, the
    first time every built replica of a class is busy at once — a
    single-stream client never pays the extra per-device compiles, and a
    loaded server grows to all chips without stalling the triggering
    request (it blocks on a busy chip exactly as a one-chip server would
    have). ``expand_to`` pre-builds replicas synchronously (deployment
    startup; the ``--serve_devices`` flag). Escalation semantics are
    per-request and unchanged: each replica re-runs its own frame at
    full-frame packing / doubled point budget when flagged.

    When passing both ``estimator`` and ``estimator_factory``, also pass
    ``class_name`` (the default estimator's class): without it, a request
    that names the default estimator's own class looks like a cold class
    and builds a duplicate — a second checkpoint load, compile, and copy
    of the weights in device memory. ``run_serve`` always passes it.

    ``warmup_hw`` compiles the default estimator's frame program at the
    given (H, W) before the socket opens so the first client request does
    not pay the compile.
    """

    def __init__(self, estimator=None, warmup_hw=None,
                 estimator_factory=None, class_name=None, devices=None):
        import jax
        self._jax = jax
        if devices is not None:
            self._devices = list(devices)
            # pin the base estimator to the explicit first device (an
            # explicit subset may not start at the process default device)
            if estimator is not None and estimator.device is None:
                estimator = estimator.replicate_to(self._devices[0])
        else:
            self._devices = list(jax.local_devices())
        self.estimator = estimator
        self._factory = estimator_factory
        self._pools = {}                    # class_name -> _Pool
        self._default_pool = None           # pool for class_name=None
        if estimator is not None:
            self._default_pool = _Pool(estimator)
            if class_name is not None:
                self._pools[class_name] = self._default_pool
        # one EXECUTION lock per chip, shared across classes (a chip runs
        # one program at a time no matter which class owns it)
        self._dev_locks = [threading.Lock() for _ in self._devices]
        self._rr = 0                        # round-robin dispatch cursor
        self._rr_lock = threading.Lock()
        self._reg_lock = threading.Lock()   # pool cache + build locks
        self._build_locks = {}              # class_name -> threading.Lock
        self._warmup_hw = warmup_hw
        self._server = None
        self._thread = None
        if warmup_hw is not None and estimator is not None:
            self._warm_estimator(estimator, warmup_hw)

    # -- request handling ---------------------------------------------------

    @staticmethod
    def _warm_estimator(est, hw):
        """Compile (and once-execute) an estimator's frame program at
        (H, W) — a zero image with a plausible depth plateau."""
        import jax
        h, w = hw
        img = np.zeros((h, w, 3), np.uint8)
        dep = np.zeros((h, w), np.float32)
        dep[h // 3:2 * h // 3, w // 3:2 * w // 3] = 700.0
        jax.block_until_ready(est.estimate(img, dep)["rt"])

    def warm_classes(self, class_names, hw=None):
        """Eagerly build + compile estimators for ``class_names`` (the
        ``--serve_classes`` warmup, run before the socket opens)."""
        for name in class_names:
            self._pool_for(name, hw=hw or self._warmup_hw)

    def _pool_for(self, class_name, hw=None):
        """Resolve a pose request's replica pool.

        Called WITHOUT any execution lock: a cold class's checkpoint load
        and first compile must not stall other classes' traffic
        (first-compile is minutes; execution is milliseconds). The
        per-class build lock makes concurrent first requests for the same
        class build it once; ``hw`` warms the frame program at that shape
        before the pool is published to the cache."""
        if class_name is None:
            if self._default_pool is None:
                raise ValueError(
                    "server has no default estimator; pose requests must "
                    "carry a class_name")
            return self._default_pool
        pool = self._pools.get(class_name)
        if pool is not None:
            return pool
        if self._factory is None:
            raise ValueError(
                f"server hosts a single class and no estimator factory; "
                f"cannot serve class_name={class_name!r}")
        with self._reg_lock:
            build_lock = self._build_locks.setdefault(class_name,
                                                      threading.Lock())
        with build_lock:
            pool = self._pools.get(class_name)
            if pool is not None:  # built while we waited
                return pool
            est = self._factory(class_name)
            if est.device is None:
                est = est.replicate_to(self._devices[0])
            if hw is not None:
                # compile-then-swap: the trace + XLA compile happens here,
                # off the execution locks; its single warmup execution
                # interleaves with locked traffic at ms cost
                self._warm_estimator(est, hw)
            pool = _Pool(est)
            self._pools[class_name] = pool
        return pool

    # -- multi-chip replica dispatch -----------------------------------------

    def n_replicas(self, class_name=None):
        """Built replica count for a class (tests/ops introspection)."""
        pool = (self._default_pool if class_name is None
                else self._pools.get(class_name))
        return 0 if pool is None else len(pool.replicas)

    def expand_to(self, n_devices=None, class_name=None, hw=None):
        """Synchronously build + warm replicas of ``class_name`` on the
        first ``n_devices`` chips (None/0 = all). Deployment startup path
        (``--serve_devices``); per-device compiles are disk loads when
        ``--compile_cache_dir`` is set. Returns the replica count."""
        pool = self._pool_for(class_name, hw=hw or self._warmup_hw)
        n = len(self._devices) if not n_devices else min(
            int(n_devices), len(self._devices))
        for i in range(n):
            self._build_replica(pool, i, hw or self._warmup_hw)
        return len(pool.replicas)

    def _build_replica(self, pool, i, hw):
        """Build (and optionally warm) pool replica ``i``; idempotent."""
        with self._reg_lock:
            if i in pool.replicas:
                return
            base = pool.replicas[min(pool.replicas)]
            est = base.replicate_to(self._devices[i])
            # publish only after warm: dispatch must never block a request
            # on another request's compile
        if hw is not None:
            self._warm_estimator(est, hw)
        with self._reg_lock:
            pool.replicas.setdefault(i, est)

    def _maybe_grow(self, pool, hw):
        """Every built replica of this class is busy: build one more, on
        the next unused chip, in the background (at most one build in
        flight per pool). The triggering request does NOT wait — it
        blocks on a busy chip exactly like a one-chip server; requests
        after the build lands spread onto the new chip."""
        with self._reg_lock:
            if pool.building or len(pool.replicas) >= len(self._devices):
                return
            try:
                i = next(j for j in range(len(self._devices))
                         if j not in pool.replicas)
            except StopIteration:
                return
            pool.building = True

        def build():
            try:
                self._build_replica(pool, i, hw)
            finally:
                pool.building = False

        threading.Thread(target=build, daemon=True).start()

    def _acquire_replica(self, pool, hw):
        """Pick a replica whose chip is free (round-robin over built
        replicas); if every one is busy, trigger background growth and
        block on the round-robin chip. Returns (device_index, estimator)
        with that chip's execution lock HELD."""
        with self._rr_lock:
            start = self._rr
            self._rr += 1
        # snapshot under the registry lock: a background _build_replica
        # publishes into pool.replicas concurrently, and iterating the
        # live dict here can raise "dictionary changed size during
        # iteration" mid-request exactly during scale-up
        with self._reg_lock:
            built = sorted(pool.replicas)
        for j in range(len(built)):
            i = built[(start + j) % len(built)]
            if self._dev_locks[i].acquire(blocking=False):
                return i, pool.replicas[i]
        self._maybe_grow(pool, hw)
        i = built[start % len(built)]
        self._dev_locks[i].acquire()
        return i, pool.replicas[i]

    def _handle_pose(self, header, payload):
        h, w = int(header["h"]), int(header["w"])
        if h <= 0 or w <= 0 or h * w > (1 << 24):
            raise ValueError(f"bad frame shape ({h}, {w})")
        need = h * w * 3 + h * w * 4
        if len(payload) != need:
            raise ValueError(
                f"payload is {len(payload)} bytes, expected {need} "
                f"for a ({h}, {w}) RGB-D frame")
        image = np.frombuffer(payload[:h * w * 3],
                              np.uint8).reshape(h, w, 3)
        depth = np.frombuffer(payload[h * w * 3:],
                              "<f4").reshape(h, w)
        class_name = header.get("class_name")

        t0 = time.perf_counter()
        # cold-class build + compile happens OUTSIDE the execution locks
        pool = self._pool_for(class_name, hw=(h, w))
        # round-robin onto a free chip; holds that chip's execution lock
        dev_i, est = self._acquire_replica(pool, hw=(h, w))
        try:
            result = est.estimate(image, depth)
            rt = result["rt"]
            icp_applied = False
            if header.get("icp"):
                if est.cad_mm is None:
                    raise ValueError(
                        "server was started without a CAD model; ICP "
                        "refinement is unavailable")
                rt = est.refine(
                    result,
                    threshold_mm=float(header.get("icp_threshold_mm", 20.0)),
                    icp_iters=(int(header["icp_iters"])
                               if "icp_iters" in header else None))
                icp_applied = True
            # One batched device->host transfer for everything the reply
            # needs (per-leaf np.asarray would sync + round-trip each).
            rt, centers, counts, overflow = self._jax.device_get(
                (rt, result["centers"], result["counts"],
                 result["overflow"]))
        finally:
            self._dev_locks[dev_i].release()
        ms = (time.perf_counter() - t0) * 1e3
        reply = {
            "ok": True,
            "rt": np.asarray(rt, np.float64).tolist(),
            "centers": np.asarray(centers, np.float64).tolist(),
            "counts": np.asarray(counts, np.float64).tolist(),
            "overflow": np.asarray(overflow).astype(bool).tolist(),
            "ms": round(ms, 3),
            "icp_applied": icp_applied,
            "device": dev_i,
        }
        if class_name is not None:
            reply["class_name"] = class_name
        return reply

    def _handle_connection(self, sock, recv_timeout=300.0):
        # A half-sent frame must not wedge the connection forever: the
        # payload length is derived from (h, w), so a client that stops
        # mid-frame just looks like a slow sender until this fires.
        sock.settimeout(recv_timeout)
        while True:
            try:
                header = _recv_json(sock)
            except (ConnectionError, TimeoutError, struct.error, OSError):
                return  # clean disconnect (or gave up on a stalled peer)
            except (ValueError, json.JSONDecodeError) as exc:
                # Framing error: the byte stream is desynced and nothing
                # after this point can be parsed — report and close.
                try:
                    _send_json(sock, {"ok": False,
                                      "error": f"framing: {exc}"})
                except OSError:
                    pass
                return
            try:
                op = header.get("op")
                if op == "ping":
                    _send_json(sock, {"ok": True, "pong": True})
                    continue
                if op == "pose":
                    h, w = int(header["h"]), int(header["w"])
                    need = h * w * 3 + h * w * 4
                    if need > _MAX_PAYLOAD or need < 0:
                        raise ValueError(f"frame too large ({need} bytes)")
                    payload = _recv_exact(sock, need)
                    _send_json(sock, self._handle_pose(header, payload))
                    continue
                raise ValueError(f"unknown op {op!r}")
            except (ConnectionError, TimeoutError):
                return
            except Exception as exc:  # report, keep the connection alive
                try:
                    _send_json(sock, {"ok": False, "error": str(exc)})
                except OSError:
                    return

    # -- lifecycle ----------------------------------------------------------

    def start(self, host="127.0.0.1", port=0):
        """Bind and serve in a background thread; returns (host, port)."""
        handle = self._handle_connection

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                handle(self.request)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[:2]

    def serve_forever(self, host="127.0.0.1", port=5555):
        """Blocking serve (the CLI entry point)."""
        addr = self.start(host, port)
        print(f"rcvpose_tpu serving on {addr[0]}:{addr[1]}", flush=True)
        try:
            self._thread.join()
        except KeyboardInterrupt:
            self.shutdown()

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------

class PoseClient:
    """Minimal blocking client for ``PoseServer``."""

    def __init__(self, host, port, timeout=600.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def ping(self):
        _send_json(self._sock, {"op": "ping"})
        return _recv_json(self._sock, limit=_MAX_PAYLOAD)

    def pose(self, image_u8, depth_mm, icp=False, icp_threshold_mm=None,
             icp_iters=None, class_name=None):
        image = np.ascontiguousarray(image_u8, np.uint8)
        depth = np.ascontiguousarray(depth_mm, "<f4")
        h, w = depth.shape
        header = {"op": "pose", "h": h, "w": w}
        if class_name is not None:
            header["class_name"] = class_name
        if icp:
            header["icp"] = True
            if icp_threshold_mm is not None:
                header["icp_threshold_mm"] = float(icp_threshold_mm)
            if icp_iters is not None:
                header["icp_iters"] = int(icp_iters)
        hdr = json.dumps(header).encode()
        self._sock.sendall(struct.pack(">I", len(hdr)) + hdr
                           + image.tobytes() + depth.tobytes())
        return _recv_json(self._sock, limit=_MAX_PAYLOAD)

    def raw(self, header_obj, payload=b""):
        """Send an arbitrary header (test hook for protocol errors)."""
        hdr = json.dumps(header_obj).encode()
        self._sock.sendall(struct.pack(">I", len(hdr)) + hdr + payload)
        return _recv_json(self._sock, limit=_MAX_PAYLOAD)

    def close(self):
        self._sock.close()


# ---------------------------------------------------------------------------
# CLI assembly: estimator from the on-disk class assets
# ---------------------------------------------------------------------------

def build_lm_estimator(cfg, class_name):
    """PoseEstimator from the LINEMOD eval-tree conventions: checkpoints
    via ``eval._load_models`` (torch ``.pth.tar`` import, orbax 3-net, or
    fused orbax), meter-valued ``<class>.ply`` (AccumulatorSpace.py:544-549)
    for the radius clips and the ICP CAD model, ``Outside9.npy`` keypoints.
    """
    from rcvpose_tpu import eval as eval_mod
    from rcvpose_tpu import infer

    root_pv = os.path.join(cfg.root_dataset, "LINEMOD", class_name)
    cad_m = eval_mod._read_eval_cad_m(
        os.path.join(root_pv, f"{class_name}.ply"))
    keypoints = np.load(os.path.join(root_pv, "Outside9.npy"))
    max_radii = eval_mod._per_kpt_max_radii_dm(cad_m, keypoints)

    _, params = eval_mod._load_models(cfg, class_name)
    variables = params[0] if getattr(cfg, "kpt_heads", 1) > 1 else params
    return infer.PoseEstimator(cfg, variables, keypoints, max_radii,
                               cad_mm=cad_m * 1000.0)


def run_serve(cfg):
    """``--mode serve`` entry: load ``cfg.class_name``'s assets and serve.

    ``cfg.class_name`` is the pre-warmed default; pose requests carrying
    another ``class_name`` lazily load that class's checkpoints/assets
    from the same tree and cache the estimator (multi-class serving).
    ``--serve_classes a,b,c`` eagerly builds + compiles those classes
    before the socket opens, so their first requests pay nothing.
    Deployments should also set ``--compile_cache_dir``: warmups and
    cold-class builds then load their XLA programs from the persistent
    cache (seconds) instead of recompiling (minutes) on every restart
    (utils.enable_compile_cache; measured in PERF.md)."""
    est = build_lm_estimator(cfg, cfg.class_name)
    warm = (cfg.image_height, cfg.image_width)
    server = PoseServer(
        est, warmup_hw=warm, class_name=cfg.class_name,
        estimator_factory=lambda cname: build_lm_estimator(cfg, cname))
    # --serve_devices N: pre-build the default class's replicas on the
    # first N chips (0 = lazy growth only — replicas still appear in the
    # background the first time every built one is busy at once). Other
    # classes always grow lazily under load.
    n_pre = int(getattr(cfg, "serve_devices", 1) or 0)
    if n_pre > 1:
        n = server.expand_to(n_pre, class_name=cfg.class_name, hw=warm)
        print(f"serving {cfg.class_name} on {n} devices", flush=True)
    eager = [c.strip() for c in getattr(cfg, "serve_classes", "").split(",")
             if c.strip() and c.strip() != cfg.class_name]
    if eager:
        print(f"warming {len(eager)} extra classes: {', '.join(eager)}",
              flush=True)
        server.warm_classes(eager, hw=warm)
    server.serve_forever(cfg.serve_host, cfg.serve_port)
