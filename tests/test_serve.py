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
        code, _ = _post(port, "/v1/retrieval/search",
                        {"queries": ["still alive"], "top_k": 1})
        assert code == 200
    finally:
        server.shutdown()
        server.server_close()


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
