"""Captioning server: socket round trip, micro-batching, error paths."""

import json
import os
import socket
import threading

import numpy as np
import pytest

# Heavy tier (~2 min (daemon end-to-end)); deselect with -m "not heavy".
pytestmark = pytest.mark.heavy

from tests._synth import build_synth_dataset


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A running CaptionServer over a tiny synth checkpoint + the dataset's
    test images; yields (server, port, img_paths, expected captions)."""
    tmp_path = tmp_path_factory.mktemp("serve")
    root = str(tmp_path / "data")
    os.makedirs(root)
    build_synth_dataset(root, n_train=2, n_val=1, n_test=3, caps_per_img=2,
                        image_size=32)
    from sat_tpu.data import generate_json_data
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 8)

    from sat_tpu.config import Config
    from sat_tpu.engine.loop import Trainer
    cfg = Config(data=root, network="vgg19", image_size=32, batch_size=4,
                 epochs=0, tf=True, attention=True, log_interval=10,
                 checkpoint_dir=str(tmp_path / "model"), perform_test=False)
    tr = Trainer(cfg)
    tr.save_epoch(1)

    import argparse

    import serve as serve_mod
    args = argparse.Namespace(
        model=str(tmp_path / "model" / "model_vgg19_1.npz"),
        model_config=None, encoder_weights=None, bert_vocab=None,
        beam_size=3, fast_topk=False, bf16_decode=False,
        host="127.0.0.1", port=0, max_batch=8, batch_window_ms=30.0)
    server = serve_mod.build_server(args)
    server._model_path = args.model      # for the mesh test to reuse
    server.start()

    img_paths = sorted({p for p in
                        json.load(open(f"{root}/test_img_paths.json"))})

    # expected captions via the library path (same params, same beam)
    from generate_caption import load_model
    from sat_tpu.data.transforms import load_and_preprocess_image
    from sat_tpu.engine.evaluate import build_token_dict, decode_caption
    from sat_tpu.models.beam import beam_search_batched, extract_caption
    from sat_tpu.models.encoder import encoder_forward
    import jax
    cfg2, dcfg, enc_p, dec_p, word_dict, _ = load_model(args.model)
    imgs = np.stack([load_and_preprocess_image(p, 32) for p in img_paths])
    res = beam_search_batched(
        dec_p, dcfg, encoder_forward(enc_p, "vgg19", imgs.astype(np.float32)),
        3)
    token_dict = build_token_dict(word_dict)
    expected = []
    for i in range(len(img_paths)):
        toks, _ = extract_caption(
            jax.tree_util.tree_map(lambda x: np.asarray(x)[i], res))
        expected.append(" ".join(decode_caption(toks, word_dict, token_dict)))

    yield server, server.port, img_paths, expected
    server.stop()


def _client(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=30)
    f = s.makefile("rwb")
    return s, f


def _ask(f, req):
    f.write((json.dumps(req) + "\n").encode())
    f.flush()
    return json.loads(f.readline())


def test_single_request_round_trip(served):
    _, port, paths, expected = served
    s, f = _client(port)
    resp = _ask(f, {"id": "r0", "path": paths[0]})
    s.close()
    assert resp["id"] == "r0"
    assert resp["caption"] == expected[0]
    assert isinstance(resp["score"], float)


def test_concurrent_requests_coalesce_and_match(served):
    server, port, paths, expected = served
    batches_before = server.stats["batches"]
    results = {}
    errs = []

    barrier = threading.Barrier(6)

    def worker(i):
        try:
            s, f = _client(port)
            barrier.wait(timeout=30)   # all sockets up before anyone sends
            resp = _ask(f, {"id": f"c{i}", "path": paths[i % len(paths)]})
            s.close()
            results[resp["id"]] = resp
        except Exception as e:   # surface in main thread
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs
    assert len(results) == 6
    for i in range(6):
        assert results[f"c{i}"]["caption"] == expected[i % len(paths)]
    # 6 near-simultaneous requests must have shared device batches
    assert server.stats["batches"] - batches_before < 6


def test_error_paths(served):
    _, port, _, _ = served
    s, f = _client(port)
    assert "error" in _ask(f, {"id": "x", "path": "/nonexistent.jpg"})
    assert "error" in _ask(f, {"id": "y"})
    f.write(b"not json\n")
    f.flush()
    assert "error" in json.loads(f.readline())
    s.close()


def test_stats_command(served):
    server, port, paths, _ = served
    s, f = _client(port)
    # at least one successful caption through THIS test so the latency
    # ring is provably non-empty regardless of test ordering
    assert "caption" in _ask(f, {"id": "st", "path": paths[0]})
    stats = _ask(f, {"cmd": "stats"})
    s.close()
    assert stats["requests"] == server.stats["requests"]
    assert stats["batches"] >= 1 and stats["uptime_s"] >= 0
    # operator surface: queue scale + end-to-end latency percentiles of
    # successful captions (enqueue -> reply, wall-clock)
    assert stats["queue_depth"] >= 0
    assert stats["captioned"] >= 1
    assert stats["latency_samples"] >= 1
    assert 0 < stats["latency_p50_ms"] <= stats["latency_p95_ms"] \
        <= stats["latency_p99_ms"]


def test_load_tool_against_server(served):
    """tools/load_test.py drives the daemon with concurrent closed-loop
    clients and reports throughput + latency percentiles."""
    import sys
    sys.path.insert(0, "tools")
    try:
        from load_test import run_load
    finally:
        sys.path.pop(0)
    server, port, paths, _ = served
    report = run_load("127.0.0.1", port, paths, n_requests=12, concurrency=3)
    assert report["errors"] == 0
    assert report["requests"] == 12
    assert report["req_per_sec"] > 0
    assert report["p50_ms"] > 0 and report["p99_ms"] >= report["p50_ms"]


def test_mesh_server_matches_single_device(served, tmp_path):
    """--mesh-data serving over the 8-device CPU mesh: same captions as the
    single-device server for the same model (buckets pad to the mesh)."""
    import argparse

    import serve as serve_mod

    server1, _, paths, expected = served
    args = argparse.Namespace(
        model=server1._model_path, model_config=None, encoder_weights=None,
        bert_vocab=None, beam_size=3, fast_topk=False, bf16_decode=False,
        host="127.0.0.1", port=0, max_batch=8, batch_window_ms=5.0,
        mesh_data=0)
    server = serve_mod.build_server(args)
    assert server._bucket_quantum == 8
    assert server._bucket(1) == 8 and server._bucket(8) == 8
    server.start()
    try:
        s, f = _client(server.port)
        resp = _ask(f, {"id": "m0", "path": paths[1]})
        s.close()
        assert resp["caption"] == expected[1]
    finally:
        server.stop()


def test_greedy_server_matches_library_greedy(served):
    """--decode greedy daemon: captions equal the library greedy path."""
    import argparse

    import jax
    import serve as serve_mod
    from generate_caption import load_model
    from sat_tpu.data.transforms import load_and_preprocess_image
    from sat_tpu.engine.evaluate import build_token_dict, decode_caption
    from sat_tpu.models.beam import greedy_caption
    from sat_tpu.models.encoder import encoder_forward

    server1, _, paths, _ = served
    args = argparse.Namespace(
        model=server1._model_path, model_config=None, encoder_weights=None,
        bert_vocab=None, beam_size=5, decode="greedy", fast_topk=False,
        bf16_decode=False, host="127.0.0.1", port=0, max_batch=4,
        batch_window_ms=5.0)
    server = serve_mod.build_server(args)
    server.start()
    try:
        s, f = _client(server.port)
        resp = _ask(f, {"id": "g0", "path": paths[0]})
        s.close()
    finally:
        server.stop()

    cfg, dcfg, enc_p, dec_p, word_dict, _ = load_model(args.model)
    img = load_and_preprocess_image(paths[0], 32)[None]
    toks, length = greedy_caption(
        dec_p, dcfg, encoder_forward(enc_p, "vgg19", img.astype(np.float32)))
    n_incl = min(int(length[0]) + 1, toks.shape[1])
    tokens = [dcfg.start_token] + np.asarray(toks)[0][:n_incl].tolist()
    token_dict = build_token_dict(word_dict)
    expected = " ".join(decode_caption(tokens, word_dict, token_dict))
    assert resp["caption"] == expected
    assert resp["completed"] is (int(length[0]) < toks.shape[1])


def test_request_ttl_expires_stale_queue_entries():
    """Requests queued longer than the TTL are answered with an error and
    never reach the device (their clients have long timed out)."""
    import serve as serve_mod

    calls = []

    def fake_fn(arr):
        calls.append(arr.shape[0])
        n = arr.shape[0]
        return {"tokens": np.zeros((n, 52), np.int32),
                "length": np.zeros((n,), np.int32),
                "score": np.zeros((n,), np.float32),
                "found": np.ones((n,), bool)}

    server = serve_mod.CaptionServer(fake_fn, 8, lambda t, l, f: ["ok"],
                                     max_batch=4, batch_window_ms=1.0,
                                     request_ttl_s=0.05)
    # enqueue directly with a stale timestamp (no started socket needed)
    import time as _time
    answered = []
    server._requests.put(({"id": "old"}, lambda o: answered.append(o),
                          _time.monotonic() - 1.0))
    batch = server._gather_batch()
    assert batch == []
    assert answered and "error" in answered[0]
    assert server.stats["expired"] == 1
    assert calls == []


def test_shutdown_command(tmp_path):
    """A dedicated tiny server so shutdown doesn't kill the shared fixture."""
    # reuse the served fixture's model via a fresh instance is heavy; build
    # a minimal fake caption fn instead — shutdown concerns only the socket
    # plumbing, not the model.
    import serve as serve_mod

    def fake_fn(arr):
        n = arr.shape[0]
        return {"tokens": np.zeros((n, 52), np.int32),
                "length": np.zeros((n,), np.int32),
                "score": np.zeros((n,), np.float32),
                "found": np.ones((n,), bool)}

    server = serve_mod.CaptionServer(fake_fn, 8, lambda t, l, f: ["ok"],
                                     max_batch=2, batch_window_ms=1.0)
    server.start()
    s, f = _client(server.port)
    resp = _ask(f, {"cmd": "shutdown"})
    assert "ok" in resp
    s.close()
    server.stop()
    assert server._stop.is_set()


def test_sample_decode_server(served):
    """--decode sample: stochastic decoding on the server (fresh rng fold
    per batch). Structural assertions only — sampling has no token-exact
    contract."""
    import argparse

    import serve as serve_mod
    server0, _, paths, _ = served
    args = argparse.Namespace(
        model=server0._model_path, model_config=None, encoder_weights=None,
        bert_vocab=None, beam_size=3, fast_topk=False, bf16_decode=False,
        host="127.0.0.1", port=0, max_batch=4, batch_window_ms=5.0,
        decode="sample", temperature=0.7, top_k=5, top_p=0.95, seed=1)
    srv = serve_mod.build_server(args)
    srv.start()
    try:
        s, f = _client(srv.port)
        r1 = _ask(f, {"id": "s0", "path": paths[0]})
        r2 = _ask(f, {"id": "s1", "path": paths[0]})
        s.close()
        for r in (r1, r2):
            assert "error" not in r, r
            assert isinstance(r["caption"], str)
            assert isinstance(r["completed"], bool)
    finally:
        srv.stop()


def test_cached_pool_requests():
    """{"cached": idx} requests are served from the pre-decoded pool with
    zero file IO (the device-path load-test mode, VERDICT r4 next #6):
    rows index the pool modulo its length, no 'path' is required, and a
    server WITHOUT a pool rejects cached requests with a clear error."""
    import serve as serve_mod

    seen = []

    def fake_fn(arr):
        seen.append(np.asarray(arr).copy())
        n = arr.shape[0]
        return {"tokens": np.tile(np.arange(52, dtype=np.int32), (n, 1)),
                "length": np.full((n,), 2, np.int32),
                "score": np.zeros((n,), np.float32),
                "found": np.ones((n,), bool)}

    pool = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    server = serve_mod.CaptionServer(fake_fn, 8, lambda t, l, f: ["ok"],
                                     max_batch=2, batch_window_ms=1.0,
                                     image_pool=pool)
    server.start()
    try:
        s, f = _client(server.port)
        r0 = _ask(f, {"id": "c0", "cached": 0})
        r5 = _ask(f, {"id": "c5", "cached": 5})   # 5 % 2 -> pool row 1
        s.close()
    finally:
        server.stop()
    assert r0.get("caption") == "ok" and r5.get("caption") == "ok"
    rows = np.concatenate(seen, axis=0)
    # every served row must be byte-identical to a pool row
    assert all(any(np.array_equal(row, p) for p in pool) for row in rows)

    # no pool -> cached requests are rejected, path requests still work
    server2 = serve_mod.CaptionServer(fake_fn, 8, lambda t, l, f: ["ok"],
                                      max_batch=2, batch_window_ms=1.0)
    server2.start()
    try:
        s, f = _client(server2.port)
        resp = _ask(f, {"id": "c1", "cached": 1})
        s.close()
    finally:
        server2.stop()
    assert "error" in resp and "pool" in resp["error"]


def test_load_test_cached_mode():
    """tools/load_test.py --cached drives the pool path end-to-end and
    reports req/s with zero errors."""
    import os
    import sys

    import serve as serve_mod
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from load_test import run_load

    def fake_fn(arr):
        n = arr.shape[0]
        return {"tokens": np.zeros((n, 52), np.int32),
                "length": np.ones((n,), np.int32),
                "score": np.zeros((n,), np.float32),
                "found": np.ones((n,), bool)}

    pool = np.zeros((4, 8, 8, 3), np.float32)
    server = serve_mod.CaptionServer(fake_fn, 8, lambda t, l, f: ["ok"],
                                     max_batch=4, batch_window_ms=1.0,
                                     image_pool=pool)
    server.start()
    try:
        out = run_load("127.0.0.1", server.port, [], 24, 4, cached=True)
    finally:
        server.stop()
    assert out["errors"] == 0
    assert out["requests"] == 24
    assert out["req_per_sec"] > 0


def test_overlap_pipelining_replies_all():
    """The one-behind batch loop (overlap=True, the default) must answer
    every request exactly once across consecutive batches, and drain the
    in-flight batch on shutdown. A slow caption_fn forces genuine overlap:
    batch N+1 is gathered while batch N's finalize is still pending."""
    import time as _time

    import serve as serve_mod

    calls = []

    def slow_fn(arr):
        calls.append(arr.shape[0])
        _time.sleep(0.05)
        n = arr.shape[0]
        return {"tokens": np.zeros((n, 52), np.int32),
                "length": np.ones((n,), np.int32),
                "score": np.zeros((n,), np.float32),
                "found": np.ones((n,), bool)}

    pool = np.zeros((4, 8, 8, 3), np.float32)
    server = serve_mod.CaptionServer(slow_fn, 8, lambda t, l, f: ["ok"],
                                     max_batch=2, batch_window_ms=1.0,
                                     image_pool=pool, overlap=True)
    server.start()
    try:
        s, f = _client(server.port)
        replies = []
        for i in range(6):   # 3+ batches at max_batch=2
            replies.append(_ask(f, {"id": f"o{i}", "cached": i}))
        s.close()
    finally:
        server.stop()
    assert len(replies) == 6
    assert all(r.get("caption") == "ok" for r in replies), replies
    ids = sorted(r.get("id") for r in replies)
    assert ids == [f"o{i}" for i in range(6)]
    assert server.stats["captioned"] == 6
    assert server.stats["errors"] == 0
