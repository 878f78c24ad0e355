#!/usr/bin/env python
"""Captioning server: dynamic micro-batching over the batched beam path.

The production serving front end the reference lacks entirely (its decode
is one image per Python `caption()` call, generate_caption.py). Requests
are newline-delimited JSON over TCP:

    {"id": "r1", "path": "/abs/image.jpg"}\n
->  {"id": "r1", "caption": "a dog runs", "score": ..., "completed": true}\n

Concurrent requests are coalesced into one device batch (up to --max-batch,
waiting at most --batch-window-ms for stragglers), padded up to a
power-of-two bucket so the jitted program compiles once per bucket, and
decoded as a single image->encoder->batched-beam TPU program
(sat_tpu.engine.serving.build_caption_step — params ride the jit as
runtime arguments, not baked constants). Image loading uses the native
C++ decode tier when SAT_NATIVE_PREPROC=1 (per-image PIL fallback).

    python serve.py --model model/model_vgg19_8.npz --port 8765 \
        --max-batch 32 --batch-window-ms 5

Shutdown: SIGTERM/SIGINT, or a client line {"cmd": "shutdown"}.
"""

from __future__ import annotations

import argparse
import collections
import itertools
import json
import os
import queue
import socket
import threading
import time


class CaptionServer:
    """Socket front end + micro-batching loop around one jitted caption fn.

    Testable in-process: `start()` binds an ephemeral port (`.port`),
    `stop()` shuts the loop down. `stats` counts requests/batches/errors so
    tests can assert coalescing happened.
    """

    def __init__(self, caption_fn, image_size: int, decode_tokens,
                 max_batch: int = 32, batch_window_ms: float = 5.0,
                 host: str = "127.0.0.1", port: int = 0, put_batch=None,
                 bucket_quantum: int = 1, request_ttl_s: float = 60.0,
                 image_pool=None, overlap: bool = True):
        self._caption_fn = caption_fn     # (B,S,S,3) f32 -> dict of arrays
        self._put_batch = put_batch       # optional: place batch on a mesh
        self._bucket_quantum = max(1, bucket_quantum)
        self._image_size = image_size
        # Pre-decoded image pool for `{"cached": idx}` requests (VERDICT r4
        # next #6): rows come straight from this (N, S, S, 3) f32 array,
        # skipping file IO + PIL/native decode entirely, so a load test can
        # measure the daemon's dispatch+decode path isolated from the
        # host's image-loading bound. None = cached requests are rejected.
        self._image_pool = image_pool
        # One-behind pipelining of the batch loop (see _dispatch_batch):
        # default on; --no-overlap restores strictly serial dispatch for
        # A/B and for debugging readback-ordering issues.
        self._overlap = overlap
        self._decode_tokens = decode_tokens   # token row -> list of words
        self._max_batch = max(1, max_batch)
        self._window_s = batch_window_ms / 1e3
        self._ttl_s = request_ttl_s
        self._host, self._port = host, port
        self._requests: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._sock: socket.socket | None = None
        self._t_start = time.monotonic()
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "errors": 0, "expired": 0,
                      "captioned": 0}
        # End-to-end (enqueue -> reply) latencies of recent successful
        # captions, seconds; bounded so a long-lived daemon's stats cost
        # stays O(1). 1024 samples keep p99 meaningful at the default
        # max_batch without holding more than a few KB.
        self._latencies: "collections.deque[float]" = collections.deque(
            maxlen=1024)

    def _count(self, key: str, n: int = 1) -> None:
        with self._stats_lock:   # += on a dict int is not atomic
            self.stats[key] += n

    # -- lifecycle -----------------------------------------------------------

    @property
    def port(self) -> int:
        assert self._sock is not None, "server not started"
        return self._sock.getsockname()[1]

    def start(self) -> None:
        self._sock = socket.create_server((self._host, self._port))
        self._sock.settimeout(0.2)
        for target in (self._accept_loop, self._batch_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        for t in list(self._threads):   # accept loop may still be appending
            t.join(timeout=10)
        if self._sock is not None:
            self._sock.close()

    def serve_forever(self) -> None:
        try:
            while not self._stop.is_set():
                time.sleep(0.2)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    # -- socket side ---------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            # daemon client threads exit on _stop within the socket
            # timeout; not tracked (one Thread per connection would
            # accumulate for the server's lifetime)
            threading.Thread(target=self._client_loop, args=(conn,),
                             daemon=True).start()

    def _client_loop(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        send_lock = threading.Lock()
        buf = b""
        with conn:
            while not self._stop.is_set():
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                except OSError:
                    return
                if not chunk:
                    return
                buf += chunk
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    if line.strip():
                        self._handle_line(line, conn, send_lock)

    def _handle_line(self, line: bytes, conn, send_lock) -> None:
        sent = []

        def reply(obj):
            if sent:   # exactly one reply per request line, even if the
                return  # batch loop's last-resort handler fires late
            sent.append(True)
            data = (json.dumps(obj) + "\n").encode()
            with send_lock:
                try:
                    conn.sendall(data)
                except OSError:
                    pass

        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            self._count("errors")
            reply({"error": "malformed JSON"})
            return
        if req.get("cmd") == "shutdown":
            reply({"ok": "shutting down"})
            self._stop.set()
            return
        if req.get("cmd") == "stats":
            with self._stats_lock:   # consistent snapshot vs the batch loop
                snapshot = dict(self.stats)
                lats = sorted(self._latencies)
            snapshot["uptime_s"] = round(
                time.monotonic() - self._t_start, 1)
            # approximate: qsize is advisory, but operators only need scale
            snapshot["queue_depth"] = self._requests.qsize()
            if lats:
                def pct(p):
                    return round(
                        lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 2)
                snapshot["latency_samples"] = len(lats)
                snapshot["latency_p50_ms"] = pct(0.50)
                snapshot["latency_p95_ms"] = pct(0.95)
                snapshot["latency_p99_ms"] = pct(0.99)
            reply(snapshot)
            return
        if "cached" in req:
            if self._image_pool is None:
                self._count("errors")
                reply({"id": req.get("id"),
                       "error": "no image pool (start with "
                                "--preload-images to serve cached "
                                "requests)"})
                return
        elif "path" not in req:
            self._count("errors")
            reply({"id": req.get("id"), "error": "missing 'path'"})
            return
        self._count("requests")
        t0 = time.monotonic()

        def timed_reply(obj, _reply=reply):
            # successful captions feed the latency ring (errors/expiries
            # would skew the percentiles toward the failure paths)
            if "caption" in obj:
                with self._stats_lock:
                    self.stats["captioned"] += 1
                    self._latencies.append(time.monotonic() - t0)
            _reply(obj)

        self._requests.put((req, timed_reply, t0))

    # -- device side ---------------------------------------------------------

    def _take(self, deadline):
        """Pop one queued request before `deadline`, expiring entries older
        than the TTL (their clients have long timed out — a device stall,
        e.g. a tunnel outage mid-compile, otherwise makes the server burn
        batches on abandoned work for minutes after recovery). Takes a
        deadline, not a timeout: each expired entry must not re-extend the
        wait."""
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise queue.Empty
            req, reply, t = self._requests.get(timeout=remaining)
            if self._ttl_s and time.monotonic() - t > self._ttl_s:
                self._count("expired")
                reply({"id": req.get("id"), "error": "expired in queue"})
                continue
            return req, reply

    def _gather_batch(self, first_wait: float = 0.2):
        """Block for the first request (up to `first_wait`), then coalesce
        stragglers for up to the batching window (or until the batch is
        full). The batch loop shortens first_wait while a dispatched batch
        is still in flight so an idle queue can't delay that batch's
        readback+replies by the full 0.2s poll."""
        try:
            first = self._take(time.monotonic() + first_wait)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self._window_s
        while len(batch) < self._max_batch:
            try:
                batch.append(self._take(deadline))
            except queue.Empty:
                break
        return batch

    def _bucket(self, n: int) -> int:
        """Smallest quantum * power-of-two >= n (capped): bounds the number
        of compiled shapes; the quantum (mesh data-axis size, default 1)
        keeps every bucket — including the cap — divisible over the mesh."""
        q = self._bucket_quantum
        b = q
        while b < n:
            b *= 2
        cap = ((max(self._max_batch, 1) + q - 1) // q) * q
        return min(b, max(cap, ((n + q - 1) // q) * q))

    def _load_images(self, batch):
        """Load every request's image; returns (imgs, live) with failures
        already answered. Uses the C++ thread-pool batch loader when the
        native decode tier is on (SAT_NATIVE_PREPROC=1), per-row PIL
        fallback otherwise/for rejected rows — mirroring
        CaptionDataset.load_image_batch."""
        from sat_tpu.data.transforms import load_and_preprocess_image

        imgs = [None] * len(batch)
        # cached rows come straight from the pre-decoded pool (no file IO)
        for i, (req, _) in enumerate(batch):
            if "cached" in req and self._image_pool is not None:
                imgs[i] = self._image_pool[int(req["cached"])
                                           % len(self._image_pool)]
        disk = [i for i, (req, _) in enumerate(batch) if imgs[i] is None
                and "path" in req]
        if disk and os.environ.get("SAT_NATIVE_PREPROC") == "1":
            from sat_tpu.data import native
            if native.decode_support():
                loaded, status = native.load_images(
                    [batch[i][0]["path"] for i in disk], self._image_size)
                if loaded is not None:
                    for j, st in enumerate(status):
                        if st == native.OK:
                            imgs[disk[j]] = loaded[j]
        out_imgs, live = [], []
        for i, (req, reply) in enumerate(batch):
            if imgs[i] is None:
                try:
                    imgs[i] = load_and_preprocess_image(
                        req["path"], self._image_size)
                except Exception as e:
                    self._count("errors")
                    reply({"id": req.get("id"), "error": f"load failed: {e}"})
                    continue
            out_imgs.append(imgs[i])
            live.append((req, reply))
        return out_imgs, live

    def _dispatch_batch(self, batch):
        """Load images and DISPATCH the device program; returns a finalize
        closure that blocks on the D2H readback and answers the clients
        (or None when every request already failed at load time). Split
        from the readback so the batch loop can overlap: JAX dispatch is
        asynchronous, so batch N computes on-device while the loop gathers
        and dispatches batch N+1 — the same one-behind pipelining that won
        1.23x in the train loop by hiding the tunnel round trip."""
        import numpy as np

        imgs, live = self._load_images(batch)
        if not live:
            return None
        n = len(live)
        bucket = self._bucket(n)
        arr = np.stack(imgs + [imgs[-1]] * (bucket - n)).astype(np.float32)
        if self._put_batch is not None:
            arr = self._put_batch(arr)
        try:
            out = self._caption_fn(arr)   # async: device arrays, not hosts
        except Exception as e:
            self._count("errors", n)
            for req, reply in live:
                reply({"id": req.get("id"), "error": f"decode failed: {e}"})
            return None

        def finalize() -> None:
            import numpy as np
            try:
                # D2H only what responses need (skips the (B,51,L) alphas);
                # async device-execution errors surface HERE, not at
                # dispatch — answer them the same way
                host = {k: np.asarray(out[k])
                        for k in ("tokens", "length", "score", "found")}
            except Exception as e:
                self._count("errors", n)
                for req, reply in live:
                    reply({"id": req.get("id"),
                           "error": f"decode failed: {e}"})
                return
            self._count("batches")
            for i, (req, reply) in enumerate(live):
                try:
                    words = self._decode_tokens(host["tokens"][i],
                                                int(host["length"][i]),
                                                bool(host["found"][i]))
                    reply({"id": req.get("id"),
                           "caption": " ".join(words),
                           "score": float(host["score"][i]),
                           "completed": bool(host["found"][i])})
                except Exception as e:  # one bad row must not kill the loop
                    self._count("errors")
                    reply({"id": req.get("id"), "error": f"postproc: {e}"})

        return finalize

    def _run_batch(self, batch) -> None:
        """Dispatch + finalize in one call (the non-overlapped path; also
        kept as the direct unit-test surface)."""
        fin = self._dispatch_batch(batch)
        if fin is not None:
            fin()

    def _batch_loop(self) -> None:
        pending = None   # finalize closure of the batch still in flight
        while not self._stop.is_set():
            # while a batch is in flight, wait only one batching window for
            # new work before flushing its replies — not the idle 0.2s poll
            batch = self._gather_batch(
                self._window_s if pending is not None else 0.2)
            nxt = None
            if batch:
                try:
                    if self._overlap:
                        nxt = self._dispatch_batch(batch)
                    else:
                        self._run_batch(batch)
                except Exception as e:
                    # The batch consumer must never die: answer everyone
                    # still waiting and keep serving.
                    self._count("errors", len(batch))
                    for req, reply in batch:
                        reply({"id": req.get("id"),
                               "error": f"server error: {e}"})
            if pending is not None:
                try:
                    pending()   # answers its own errors; guard regardless
                except Exception:
                    pass
            pending = nxt
        if pending is not None:   # drain the in-flight batch on shutdown
            try:
                pending()
            except Exception:
                pass


def build_server(args) -> CaptionServer:
    from generate_caption import load_model
    from sat_tpu.engine.evaluate import (build_token_dict, decode_caption,
                                         decode_caption_bert)
    from sat_tpu.engine.serving import build_caption_step
    from sat_tpu.utils.compilation_cache import enable_persistent_cache

    import jax

    enable_persistent_cache()
    cfg, dcfg, enc_params, dec_params, word_dict, tokenizer = load_model(
        args.model, args.model_config, encoder_weights=args.encoder_weights,
        bert_vocab=args.bert_vocab)

    # Data-parallel serving (same scheme as caption_split --mesh-data):
    # params replicated, batch dim sharded; decode is row-independent so
    # XLA partitions the program with zero collectives.
    put_batch = None
    bucket_quantum = 1
    mesh_data = getattr(args, "mesh_data", 1)
    if mesh_data != 1:
        import jax.numpy as jnp
        from sat_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           replicated)
        mesh = make_mesh(n_data=mesh_data, n_model=1)
        bucket_quantum = mesh.shape["data"]
        rep = replicated(mesh)
        enc_params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, enc_params), rep)
        dec_params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, dec_params), rep)
        img_sharding = batch_sharding(mesh)
        put_batch = lambda arr: jax.device_put(arr, img_sharding)

    decode_mode = getattr(args, "decode", "beam")
    # jit the params-as-ARGS step, not the baked closure: closing over the
    # weights inlines them as HLO constants in every compile upload
    # (80-240 MB depending on backbone — the round-5 HTTP-413 finding,
    # build_caption_step docstring). Params live on device; passing them
    # per call costs nothing at dispatch.
    step = jax.jit(build_caption_step(
        cfg.network, dcfg,
        args.beam_size, fast_topk=args.fast_topk,
        pallas_topk=getattr(args, "pallas_topk", None),
        bf16=args.bf16_decode, decode=decode_mode,
        mesh_data=bucket_quantum,
        temperature=getattr(args, "temperature", 1.0),
        top_k=getattr(args, "top_k", 0),
        top_p=getattr(args, "top_p", 1.0)))
    if decode_mode == "sample":
        fn = lambda arr, rng: step(enc_params, dec_params, arr, rng)
    else:
        fn = lambda arr: step(enc_params, dec_params, arr)
    if decode_mode == "sample":
        # The sample closure takes (images, rng); hand the server a
        # single-arg fn with a fresh fold of the seed per batch. Without an
        # explicit --seed, mix in a process-unique value so a restarted
        # server doesn't replay the exact same caption sequence for the
        # same request order (ADVICE r3); with --seed the replay is the
        # documented, intended property.
        seed = getattr(args, "seed", None)
        if seed is None:
            base_rng = jax.random.fold_in(
                jax.random.PRNGKey(0),
                (os.getpid() ^ time.time_ns()) & 0x7FFFFFFF)
        else:
            base_rng = jax.random.PRNGKey(seed)
        counter = itertools.count()
        counter_lock = threading.Lock()   # batch dispatch may go threaded

        def fn(arr, _inner=fn):
            with counter_lock:
                i = next(counter)
            return _inner(arr, jax.random.fold_in(base_rng, i))
    token_dict = build_token_dict(word_dict) if word_dict else None

    def decode_tokens(tokens, length, found):
        # Beam keeps the reference fallback semantics (decoder.py:256-258
        # via beam.extract_caption): no completed sentence -> token [0].
        # Greedy rows carry their (possibly truncated) tokens either way;
        # `found` still reaches the client as `completed`.
        if decode_mode == "beam" and not found:
            row = [0]
        else:
            row = tokens[:length + 1].tolist()
        if cfg.bert:
            return decode_caption_bert(row, tokenizer)
        return decode_caption(row, word_dict, token_dict)

    # Pre-decoded pool for {"cached": idx} requests: decode up to
    # --preload-count images ONCE at startup so a load test (tools/
    # load_test.py --cached) measures the daemon's dispatch+decode path
    # isolated from this host's image-loading bound (VERDICT r4 next #6).
    image_pool = None
    preload = getattr(args, "preload_images", None)
    if preload:
        import glob as _glob

        import numpy as np

        from sat_tpu.data.transforms import load_and_preprocess_image
        paths = sorted(
            p for p in _glob.glob(os.path.join(preload, "*"))
            if os.path.isfile(p)) if os.path.isdir(preload) else [preload]
        count = max(1, getattr(args, "preload_count", 32))
        rows, used = [], []
        for p in paths:
            if len(rows) >= count:
                break
            try:
                rows.append(load_and_preprocess_image(p, cfg.image_size))
                used.append(p)
            except Exception:
                continue   # non-image files in the dir are fine to skip
        if not rows:
            raise SystemExit(f"--preload-images {preload}: no decodable "
                             f"images found")
        image_pool = np.stack(rows).astype(np.float32)
        print(f"preloaded {len(rows)} images into the cached-request pool")

    return CaptionServer(fn, cfg.image_size, decode_tokens,
                         max_batch=args.max_batch,
                         batch_window_ms=args.batch_window_ms,
                         host=args.host, port=args.port,
                         put_batch=put_batch, bucket_quantum=bucket_quantum,
                         request_ttl_s=getattr(args, "request_ttl_s", 60.0),
                         image_pool=image_pool,
                         overlap=getattr(args, "overlap", True))


def main():
    parser = argparse.ArgumentParser(description="Captioning server")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--model-config", type=str, default=None)
    parser.add_argument("--encoder-weights", type=str, default=None)
    parser.add_argument("--bert-vocab", type=str, default=None)
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--decode", choices=["beam", "greedy", "sample"],
                        default="beam",
                        help="decoding strategy (greedy = argmax fast path; "
                             "sample = stochastic with temperature/top-k/"
                             "top-p, fresh rng per batch)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--top-k", type=int, default=0)
    parser.add_argument("--top-p", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=None,
                        help="base rng seed for --decode sample. Explicit "
                             "seed => a restarted server REPLAYS the same "
                             "caption sequence for the same request order; "
                             "default mixes in pid+boot time for fresh "
                             "samples per process")
    parser.add_argument("--fast-topk", action="store_true", default=False)
    parser.add_argument("--pallas-topk", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="exact Pallas top-k selection kernel in the "
                             "beam (token-identical to lax.top_k; measured "
                             "1.085x on v5e). Default: ON unless "
                             "--fast-topk; --no-pallas-topk forces the "
                             "lax formulation (A/B: tools/bench_topk.py)")
    parser.add_argument("--bf16-decode", action="store_true", default=False)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--batch-window-ms", type=float, default=5.0)
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="data-parallel serving over this many devices "
                             "(0 = all); batch buckets stay divisible by "
                             "the mesh")
    parser.add_argument("--request-ttl-s", type=float, default=60.0,
                        help="drop queued requests older than this (their "
                             "clients have timed out); 0 disables")
    parser.add_argument("--preload-images", type=str, default=None,
                        help="image file or directory to pre-decode into "
                             "the cached-request pool at startup; clients "
                             "can then send {\"cached\": idx} instead of a "
                             "path, skipping file IO + decode (isolates "
                             "the device path for load tests)")
    parser.add_argument("--preload-count", type=int, default=32,
                        help="max images decoded into the pool")
    parser.add_argument("--no-overlap", action="store_false", dest="overlap",
                        default=True,
                        help="disable one-behind batch pipelining (batch "
                             "N+1 gathers/dispatches while batch N computes"
                             " on device; default on)")
    args = parser.parse_args()

    server = build_server(args)
    server.start()
    print(f"captioning server listening on {args.host}:{server.port} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms}ms)")

    import signal

    def _term(signum, frame):
        server._stop.set()

    signal.signal(signal.SIGTERM, _term)
    server.serve_forever()
    print(f"server stopped; stats: {server.stats}")


if __name__ == "__main__":
    main()
