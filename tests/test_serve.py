"""HTTP serving driver (cli/serve.py): endpoints over a tiny model."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from univl_tpu.data import fixtures


@pytest.fixture(scope="module")
def vocab(tmp_path_factory):
    return fixtures.make_vocab(str(tmp_path_factory.mktemp("v") / "vocab.txt"))


TINY = [
    "--video_dim", "32", "--max_words", "16", "--max_frames", "12",
    "--text_num_hidden_layers", "2", "--visual_num_hidden_layers", "1",
    "--cross_num_hidden_layers", "1", "--decoder_num_hidden_layers", "1",
    "--hidden_size", "64", "--num_attention_heads", "4",
    "--intermediate_size", "128", "--seed", "0",
]


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_endpoints(tmp_path, vocab):
    from univl_tpu.cli.serve import main

    server = main(
        ["--mode", "both", "--rerank_store_full", "--vocab_file", vocab,
         "--output_dir", str(tmp_path / "srv"), "--host", "127.0.0.1",
         "--port", "0", "--serve_batch_size", "4", "--beam_size", "2",
         "--stage_two"] + TINY,
        serve_forever=False,
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["indexed"] == 0

        rng = np.random.RandomState(0)
        vids = [rng.randn(rng.randint(3, 10), 32).tolist() for _ in range(5)]
        code, out = _post(port, "/v1/retrieval/add",
                          {"videos": vids, "ids": [f"v{i}" for i in range(5)]})
        assert code == 200 and out["indexed"] == 5

        code, out = _post(port, "/v1/retrieval/search",
                          {"queries": ["mix the batter"], "top_k": 3})
        assert code == 200
        hits = out["results"][0]
        assert len(hits) == 3 and hits[0]["score"] >= hits[-1]["score"]

        # cross-encoder rerank path
        code, out2 = _post(port, "/v1/retrieval/search",
                           {"queries": ["mix the batter"], "top_k": 2,
                            "rerank": 4})
        assert code == 200 and len(out2["results"][0]) == 2

        code, out = _post(port, "/v1/retrieval/save",
                          {"path": str(tmp_path / "idx.npz")})
        assert code == 200

        code, out = _post(port, "/v1/caption", {"videos": vids[:3]})
        assert code == 200 and len(out["captions"]) == 3
        assert all(isinstance(c, str) for c in out["captions"])

        # feature_paths input
        np.save(tmp_path / "clip.npy", np.asarray(vids[0], np.float32))
        code, out = _post(port, "/v1/caption",
                          {"feature_paths": [str(tmp_path / "clip.npy")]})
        assert code == 200 and len(out["captions"]) == 1

        # malformed request -> 400 JSON error, server keeps serving
        code, out = _post(port, "/v1/retrieval/search", {"nope": 1})
        assert code == 400 and "error" in out

        # malformed transcripts rejected HANDLER-SIDE (before the
        # coalescer can merge them into a shared decode batch) — the
        # isolation contract in serving/coalesce.py's docstring
        code, out = _post(port, "/v1/caption",
                          {"videos": vids[:1], "transcripts": [123]})
        assert code == 400 and "strings" in out["error"]
        code, out = _post(port, "/v1/caption",
                          {"videos": vids[:1], "transcripts": ["a", "b"]})
        assert code == 400 and "length" in out["error"]
        code, out = _post(port, "/v1/caption",
                          {"videos": vids[:1], "transcripts": ["ok"]})
        assert code == 200 and len(out["captions"]) == 1
        code, _ = _post(port, "/v1/retrieval/search",
                        {"queries": ["still alive"], "top_k": 1})
        assert code == 200
    finally:
        server.shutdown()
        server.server_close()


def test_serve_concurrent_requests(tmp_path, vocab):
    """N in-flight requests mixing caption/search/add (VERDICT r2 item 5).

    The device lock in make_server serializes device work, but the HTTP
    layer (ThreadingHTTPServer), the tokenizer, and the Batcher all see
    genuine concurrency here. Two phases:
      A. concurrent READS (search/caption/healthz) against a frozen index
         must each equal the sequential oracle captured beforehand;
      B. concurrent WRITES (disjoint adds from 4 threads) racing searches
         and captions must end in exactly the union state — final search
         results equal a fresh single-threaded server given the same
         videos, and captions are unaffected by the racing adds.
    """
    from concurrent.futures import ThreadPoolExecutor

    from univl_tpu.cli.serve import main

    server = main(
        ["--mode", "both", "--rerank_store_full", "--vocab_file", vocab,
         "--output_dir", str(tmp_path / "srv"), "--host", "127.0.0.1",
         "--port", "0", "--serve_batch_size", "4", "--beam_size", "2",
         "--stage_two"] + TINY,
        serve_forever=False,
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.RandomState(7)
    base_vids = [rng.randn(rng.randint(3, 10), 32).tolist() for _ in range(4)]
    extra_vids = [rng.randn(5, 32).tolist() for _ in range(8)]
    queries = ["mix the batter", "heat the oil", "slice the onion",
               "pour the sauce"]
    cap_vids = base_vids[:2]
    try:
        code, out = _post(port, "/v1/retrieval/add",
                          {"videos": base_vids,
                           "ids": [f"b{i}" for i in range(4)]})
        assert code == 200 and out["indexed"] == 4

        # sequential oracle for phase A
        oracle_search = {}
        for q in queries:
            code, out = _post(port, "/v1/retrieval/search",
                              {"queries": [q], "top_k": 4, "rerank": 4})
            assert code == 200
            oracle_search[q] = out["results"]
        code, out = _post(port, "/v1/caption", {"videos": cap_vids})
        assert code == 200
        oracle_caps = out["captions"]

        def do_search(q):
            return ("search", q, _post(port, "/v1/retrieval/search",
                                       {"queries": [q], "top_k": 4,
                                        "rerank": 4}))

        def do_caption(_):
            return ("caption", None, _post(port, "/v1/caption",
                                           {"videos": cap_vids}))

        def do_health(_):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz") as r:
                return ("health", None, (r.status, json.loads(r.read())))

        # phase A: 24 concurrent reads
        jobs = []
        for i in range(6):
            jobs += [(do_search, queries[i % 4]), (do_caption, None),
                     (do_health, None), (do_search, queries[(i + 1) % 4])]
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(lambda fa: fa[0](fa[1]), jobs))
        for kind, q, (code, out) in results:
            assert code == 200, (kind, out)
            if kind == "search":
                assert out["results"] == oracle_search[q], q
            elif kind == "caption":
                assert out["captions"] == oracle_caps
            else:
                assert out["status"] == "ok" and out["indexed"] == 4

        # phase B: 4 disjoint adds racing searches + captions
        def do_add(k):
            return ("add", k, _post(
                port, "/v1/retrieval/add",
                {"videos": extra_vids[2 * k: 2 * k + 2],
                 "ids": [f"x{2 * k}", f"x{2 * k + 1}"]}))

        jobs = [(do_add, k) for k in range(4)]
        jobs += [(do_search, q) for q in queries]
        jobs += [(do_caption, None)] * 2
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(lambda fa: fa[0](fa[1]), jobs))
        counts = []
        for kind, q, (code, out) in results:
            assert code == 200, (kind, out)
            if kind == "add":
                counts.append(out["indexed"])
            elif kind == "caption":
                assert out["captions"] == oracle_caps  # adds don't perturb
        assert max(counts) <= 12 and min(counts) >= 6  # 4 + 2 per add

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert json.loads(r.read())["indexed"] == 12

        code, final = _post(port, "/v1/retrieval/search",
                            {"queries": queries, "top_k": 12})
        assert code == 200
    finally:
        server.shutdown()
        server.server_close()

    # final-state oracle: fresh server, same videos added sequentially
    srv2 = main(
        ["--mode", "retrieval", "--rerank_store_full", "--stage_two",
         "--vocab_file", vocab,
         "--output_dir", str(tmp_path / "srv2"), "--host", "127.0.0.1",
         "--port", "0", "--serve_batch_size", "4"] + TINY,
        serve_forever=False,
    )
    p2 = srv2.server_address[1]
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        _post(p2, "/v1/retrieval/add",
              {"videos": base_vids, "ids": [f"b{i}" for i in range(4)]})
        _post(p2, "/v1/retrieval/add",
              {"videos": extra_vids, "ids": [f"x{i}" for i in range(8)]})
        code, ref = _post(p2, "/v1/retrieval/search",
                          {"queries": queries, "top_k": 12})
        assert code == 200
        for got, want in zip(final["results"], ref["results"]):
            assert [h["id"] for h in got] == [h["id"] for h in want]
            np.testing.assert_allclose(
                [h["score"] for h in got], [h["score"] for h in want],
                rtol=1e-5, atol=1e-6)
    finally:
        srv2.shutdown()
        srv2.server_close()


def test_serve_loads_saved_index(tmp_path, vocab):
    from univl_tpu.cli.serve import main

    # build + save an index with one server...
    srv1 = main(
        ["--mode", "retrieval", "--vocab_file", vocab,
         "--output_dir", str(tmp_path / "a"), "--port", "0",
         "--serve_batch_size", "4"] + TINY,
        serve_forever=False,
    )
    p1 = srv1.server_address[1]
    threading.Thread(target=srv1.serve_forever, daemon=True).start()
    rng = np.random.RandomState(1)
    vids = [rng.randn(6, 32).tolist() for _ in range(4)]
    _post(p1, "/v1/retrieval/add", {"videos": vids, "ids": list("abcd")})
    idx_path = str(tmp_path / "saved.npz")
    _post(p1, "/v1/retrieval/save", {"path": idx_path})
    code, ref = _post(p1, "/v1/retrieval/search",
                      {"queries": ["x"], "top_k": 2})
    srv1.shutdown(); srv1.server_close()

    # ...and serve it from a fresh process-equivalent with --index
    srv2 = main(
        ["--mode", "retrieval", "--vocab_file", vocab, "--index", idx_path,
         "--output_dir", str(tmp_path / "b"), "--port", "0",
         "--serve_batch_size", "4"] + TINY,
        serve_forever=False,
    )
    p2 = srv2.server_address[1]
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    code, out = _post(p2, "/v1/retrieval/search", {"queries": ["x"], "top_k": 2})
    assert code == 200
    assert [h["id"] for h in out["results"][0]] == [
        h["id"] for h in ref["results"][0]
    ]
    srv2.shutdown(); srv2.server_close()


def test_serving_fused_decode_default_resolution():
    """Serving defaults the fused decode kernel ON for the TPU backend
    only (measured 1.26x decode ceiling, docs/PERF.md); an explicit
    argument — e.g. --no-fused_decode through cli/serve.py — beats the
    env var in both directions; the env var beats the backend default."""
    from univl_tpu.serving.captioning import resolve_serving_fused_decode

    # backend default: on for tpu, off elsewhere (interpret mode is slow)
    assert resolve_serving_fused_decode(None, "tpu", "") is True
    assert resolve_serving_fused_decode(None, "cpu", "") is False
    # env var enables off-TPU too
    assert resolve_serving_fused_decode(None, "cpu", "1") is True
    # explicit argument wins in both directions
    assert resolve_serving_fused_decode(False, "tpu", "1") is False
    assert resolve_serving_fused_decode(True, "cpu", "") is True
    # env var is three-state: '0'/'false'/'off'/'no' DISABLE, even on TPU
    # (an operator exporting UNIVL_TPU_FUSED_DECODE=0 means off)
    for off in ("0", "false", "off", "no", "FALSE", " Off "):
        assert resolve_serving_fused_decode(None, "tpu", off) is False
    assert resolve_serving_fused_decode(None, "cpu", "interpret") is True


def test_serve_feature_paths_validated(tmp_path):
    """The feature_paths branch of _decode_videos must apply the same
    [T, video_dim] validation as inline videos — a wrong-shaped .npy file
    must fail ITS request, not poison a coalesced decode batch (the
    coalescer relies on handler-side validation before enqueue)."""
    import numpy as np
    import pytest

    from univl_tpu.cli.serve import _decode_videos

    good = tmp_path / "good.npy"
    np.save(good, np.zeros((4, 8), np.float32))
    out = _decode_videos({"feature_paths": [str(good)]}, video_dim=8)
    assert out[0].shape == (4, 8)

    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((4, 1), np.float32))  # would broadcast silently
    with pytest.raises(ValueError):
        _decode_videos({"feature_paths": [str(bad)]}, video_dim=8)
    bad3d = tmp_path / "bad3d.npy"
    np.save(bad3d, np.zeros((2, 4, 8), np.float32))
    with pytest.raises(ValueError):
        _decode_videos({"feature_paths": [str(bad3d)]}, video_dim=8)
