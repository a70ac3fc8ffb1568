"""Serving layer: VideoRetrievalIndex (dense + cross rerank) and CaptionService."""

import numpy as np
import jax
import pytest

from univl_tpu.config import UniVLConfig
from univl_tpu.data import fixtures
from univl_tpu.data.tokenization import WordPieceTokenizer
from univl_tpu.models.univl import UniVL
from univl_tpu.serving import CaptionService, VideoRetrievalIndex


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    path = fixtures.make_vocab(str(tmp_path_factory.mktemp("v") / "vocab.txt"))
    return WordPieceTokenizer(path)


def _model_and_params(tokenizer, rng, **cfg_kw):
    from univl_tpu.config import BertConfig, DecoderConfig

    # match the model vocab to the fixture tokenizer so decoded ids map back
    enc = dict(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128,
    )
    cfg_kw.setdefault("bert", BertConfig(vocab_size=len(tokenizer), **enc))
    cfg_kw.setdefault(
        "decoder",
        DecoderConfig(
            vocab_size=len(tokenizer), num_decoder_layers=2,
            max_target_embeddings=512, **enc,
        ),
    )
    cfg = UniVLConfig.tiny(**cfg_kw)
    model = UniVL(cfg)
    batch = {
        "input_ids": np.ones((2, cfg.max_words), np.int32),
        "token_type_ids": np.zeros((2, cfg.max_words), np.int32),
        "attention_mask": np.ones((2, cfg.max_words), np.int32),
        "video": rng.randn(2, cfg.max_frames, cfg.video_dim).astype(np.float32),
        "video_mask": np.ones((2, cfg.max_frames), np.int32),
    }
    if cfg.stage_two and not cfg.train_sim_after_cross:
        batch.update(
            input_caption_ids=np.ones((2, cfg.max_words), np.int32),
            decoder_mask=np.ones((2, cfg.max_words), np.int32),
            output_caption_ids=np.ones((2, cfg.max_words), np.int32),
        )
    params = {
        "params": model.init(jax.random.key(0), batch, deterministic=True)["params"]
    }
    return cfg, model, params


def _videos(rng, n, dim, tmin=3, tmax=12):
    return [
        rng.randn(rng.randint(tmin, tmax), dim).astype(np.float32)
        for _ in range(n)
    ]


def test_index_add_search_roundtrip(rng, tokenizer, tmp_path):
    cfg, model, params = _model_and_params(tokenizer, rng)
    idx = VideoRetrievalIndex(model, params, tokenizer, batch_size=4)
    vids = _videos(rng, 10, cfg.video_dim)
    idx.add(vids, ids=[f"v{i}" for i in range(10)])
    assert len(idx) == 10

    res = idx.search(["cooking pasta", "slice the onion"], top_k=3)
    assert len(res) == 2 and all(len(r) == 3 for r in res)
    for r in res:
        ids = [i for i, _ in r]
        scores = [s for _, s in r]
        assert len(set(ids)) == 3
        assert scores == sorted(scores, reverse=True)

    # save/load preserves results exactly
    path = str(tmp_path / "index.npz")
    idx.save(path)
    idx2 = VideoRetrievalIndex.load(path, model, params, tokenizer, batch_size=4)
    res2 = idx2.search(["cooking pasta", "slice the onion"], top_k=3)
    assert res == res2

    # incremental add after load
    idx2.add(_videos(rng, 3, cfg.video_dim), ids=["a", "b", "c"])
    assert len(idx2) == 13


def test_index_dense_matches_evaluator_pooling(rng, tokenizer):
    """Index embeddings must equal the eval pipeline's pooled embeddings
    (same normalization contract as joint_similarity)."""
    cfg, model, params = _model_and_params(tokenizer, rng)
    idx = VideoRetrievalIndex(model, params, tokenizer, batch_size=4)
    vids = _videos(rng, 4, cfg.video_dim)
    idx.add(vids)

    from univl_tpu.data.text_encoding import pad_video

    feats = np.stack(
        [pad_video(v, cfg.max_frames, cfg.video_dim)[0] for v in vids]
    )
    masks = np.stack(
        [pad_video(v, cfg.max_frames, cfg.video_dim)[1] for v in vids]
    )
    batch = {
        "input_ids": np.ones((4, cfg.max_words), np.int32),
        "token_type_ids": np.zeros((4, cfg.max_words), np.int32),
        "attention_mask": np.ones((4, cfg.max_words), np.int32),
        "video": feats,
        "video_mask": masks,
    }
    seq, vis = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    _, video_out = UniVL.mean_pool(seq, vis, batch["attention_mask"], batch["video_mask"])
    video_out = np.asarray(video_out)
    video_out = video_out / np.linalg.norm(video_out, axis=-1, keepdims=True)
    np.testing.assert_allclose(idx.video_emb, video_out, atol=1e-5)


def test_index_rerank_orders_by_cross_scores(rng, tokenizer):
    cfg, model, params = _model_and_params(
        tokenizer, rng, train_sim_after_cross=True
    )
    idx = VideoRetrievalIndex(
        model, params, tokenizer, batch_size=4, store_full=True
    )
    idx.add(_videos(rng, 8, cfg.video_dim), ids=[f"v{i}" for i in range(8)])
    res = idx.search(["stir the soup"], top_k=2, rerank=6)
    assert len(res) == 1 and len(res[0]) == 2
    scores = [s for _, s in res[0]]
    assert scores == sorted(scores, reverse=True)
    # rerank scores come from the cross head, not the dense dot product
    dense = idx.search(["stir the soup"], top_k=2)
    assert not np.allclose(
        [s for _, s in dense[0]], scores
    )


def test_index_requires_cross_for_store_full(rng, tokenizer):
    cfg, model, params = _model_and_params(tokenizer, rng)  # no cross tower
    with pytest.raises(AssertionError):
        VideoRetrievalIndex(model, params, tokenizer, store_full=True)


def test_caption_service_ragged_batches(rng, tokenizer):
    cfg, model, params = _model_and_params(
        tokenizer, rng, stage_two=True, task_type="caption"
    )
    svc = CaptionService(
        model, params, tokenizer, beam_size=2, max_len=8, batch_size=4
    )
    vids = _videos(rng, 5, cfg.video_dim)  # 5 rows -> one full + one ragged batch
    caps = svc.caption(vids)
    assert len(caps) == 5
    assert all(isinstance(c, str) for c in caps)
    # with transcripts: same count, deterministic across calls
    caps_t = svc.caption(vids, transcripts=["chop the garlic"] * 5)
    caps_t2 = svc.caption(vids, transcripts=["chop the garlic"] * 5)
    assert caps_t == caps_t2


def test_index_mesh_sharded_matches_single(rng, tokenizer):
    """Mesh-sharded index encode must produce identical search results."""
    import jax
    from univl_tpu.parallel.mesh import make_mesh

    cfg, model, params = _model_and_params(tokenizer, rng)
    vids = _videos(rng, 9, cfg.video_dim)
    ids = [f"v{i}" for i in range(9)]
    queries = ["whisk the eggs", "pour into the pan"]

    idx1 = VideoRetrievalIndex(model, params, tokenizer, batch_size=8)
    idx1.add(vids, ids=ids)
    r1 = idx1.search(queries, top_k=4)

    assert len(jax.devices()) == 8
    idx2 = VideoRetrievalIndex(
        model, params, tokenizer, batch_size=8, mesh=make_mesh()
    )
    idx2.add(vids, ids=ids)
    r2 = idx2.search(queries, top_k=4)

    np.testing.assert_allclose(idx1.video_emb, idx2.video_emb, atol=1e-5)
    for a, b in zip(r1, r2):
        assert [i for i, _ in a] == [i for i, _ in b]
        np.testing.assert_allclose(
            [s for _, s in a], [s for _, s in b], atol=1e-5
        )


def test_index_edge_cases(rng, tokenizer):
    """Empty index, top_k exceeding the corpus, and single-frame clips."""
    cfg, model, params = _model_and_params(tokenizer, rng)
    idx = VideoRetrievalIndex(model, params, tokenizer, batch_size=4)

    res = idx.search(["anything"], top_k=3)  # empty index
    assert res == [[]]

    idx.add(_videos(rng, 2, cfg.video_dim) + [rng.randn(1, cfg.video_dim).astype(np.float32)],
            ids=["a", "b", "one_frame"])
    res = idx.search(["anything"], top_k=10)  # top_k > corpus size
    assert len(res[0]) == 3
    assert {i for i, _ in res[0]} == {"a", "b", "one_frame"}


def test_caption_service_resolved_fused_decode(rng, tokenizer, monkeypatch):
    """The service stores and applies the resolved serving default
    (CPU backend here -> unfused), and an explicit argument sticks."""
    monkeypatch.delenv("UNIVL_TPU_FUSED_DECODE", raising=False)
    cfg, model, params = _model_and_params(
        rng=rng, tokenizer=tokenizer, stage_two=True, task_type="caption"
    )
    svc = CaptionService(model, params, tokenizer, beam_size=2, max_len=8,
                         batch_size=2)
    assert svc.fused_decode is False
    # explicit True on CPU: runs the kernel in interpret mode — captions
    # must still come back (parity with the unfused path is pinned in
    # tests/test_fast_decoder.py)
    svc_f = CaptionService(model, params, tokenizer, beam_size=2, max_len=8,
                           batch_size=2, fused_decode=True)
    assert svc_f.fused_decode is True
    vids = _videos(rng, 2, cfg.video_dim)
    assert svc.caption(vids) == svc_f.caption(vids)


# ---------------------------------------------------------------- #
# Request coalescing (serving/coalesce.py)


class _StubService:
    """CaptionService stand-in: deterministic per-clip 'captions' keyed on
    the clip's first value, records the clip-count of every decode call."""

    def __init__(self, batch_size=4, fail_on=None, block_first=None):
        self.batch_size = batch_size
        self.calls = []
        self.fail_on = fail_on
        self.block_first = block_first  # threading.Event: gate 1st call

    def caption(self, videos, transcripts=None):
        if self.block_first is not None:
            ev, self.block_first = self.block_first, None
            ev.wait(10)
        self.calls.append(len(videos))
        if transcripts is None:
            transcripts = [""] * len(videos)
        out = []
        for v, t in zip(videos, transcripts):
            key = float(np.asarray(v)[0, 0])
            if self.fail_on is not None and key == self.fail_on:
                raise ValueError(f"bad clip {key}")
            out.append(f"cap:{key:.3f}:{t}")
        return out


def _clip(val, t=3, dim=4):
    v = np.zeros((t, dim), np.float32)
    v[0, 0] = val
    return v


def test_coalescer_merges_concurrent_requests():
    """Requests submitted while the device is busy are merged into one
    decode; results are routed back per request in order."""
    from concurrent.futures import ThreadPoolExecutor

    from univl_tpu.serving.coalesce import CoalescingCaptionService

    gate = __import__("threading").Event()
    stub = _StubService(batch_size=8, block_first=gate)
    svc = CoalescingCaptionService(stub)
    try:
        with ThreadPoolExecutor(max_workers=6) as ex:
            # first request occupies the 'device' (blocked on the gate)
            f0 = ex.submit(svc.caption, [_clip(0.0)])
            while stub.block_first is not None:  # worker picked it up
                __import__("time").sleep(0.01)
            # five more queue up behind it
            fs = [ex.submit(svc.caption, [_clip(float(i))])
                  for i in range(1, 6)]
            __import__("time").sleep(0.1)  # let them all enqueue
            gate.set()
            assert f0.result(10) == ["cap:0.000:"]
            for i, f in enumerate(fs, start=1):
                assert f.result(10) == [f"cap:{i:.3f}:"]
    finally:
        svc.close()
    # call 1: the blocked single; call 2: the five queued merged into one
    assert stub.calls[0] == 1
    assert sum(stub.calls) == 6
    assert len(stub.calls) <= 3  # 5 queued clips need at most 2 more calls


def test_coalescer_oversize_and_transcripts():
    """A request that would overflow the group is carried into the next
    decode in arrival order; mixed with/without-transcript requests are
    exact (transcript '' == no transcript)."""
    from univl_tpu.serving.coalesce import CoalescingCaptionService

    stub = _StubService(batch_size=4)
    svc = CoalescingCaptionService(stub)
    try:
        # oversized single request: runs alone, service chunks internally
        out = svc.caption([_clip(float(i)) for i in range(6)])
        assert out == [f"cap:{float(i):.3f}:" for i in range(6)]
        # transcripts pass through per clip
        out = svc.caption([_clip(9.0)], transcripts=["mix the batter"])
        assert out == ["cap:9.000:mix the batter"]
    finally:
        svc.close()


def test_coalescer_error_propagates_to_waiters():
    from univl_tpu.serving.coalesce import CoalescingCaptionService

    stub = _StubService(batch_size=4, fail_on=13.0)
    svc = CoalescingCaptionService(stub)
    try:
        with pytest.raises(ValueError, match="bad clip"):
            svc.caption([_clip(13.0)])
        # the service keeps serving after a failed group
        assert svc.caption([_clip(1.0)]) == ["cap:1.000:"]
    finally:
        svc.close()


def test_coalescer_matches_direct_service(rng, tokenizer):
    """Real model: coalesced captions are identical to direct ones —
    grouping only changes batch PACKING, and per-row decode results are
    independent of the other rows (pinned at the kernel level by
    tests/test_fast_decoder.py)."""
    from concurrent.futures import ThreadPoolExecutor

    from univl_tpu.serving.coalesce import CoalescingCaptionService

    cfg, model, params = _model_and_params(
        rng=rng, tokenizer=tokenizer, stage_two=True, task_type="caption"
    )
    direct = CaptionService(model, params, tokenizer, beam_size=2,
                            max_len=8, batch_size=4)
    vids = _videos(rng, 6, cfg.video_dim)
    want = direct.caption(vids)

    svc = CoalescingCaptionService(direct)
    try:
        with ThreadPoolExecutor(max_workers=6) as ex:
            futs = [ex.submit(svc.caption, [v]) for v in vids]
            got = [f.result(120)[0] for f in futs]
    finally:
        svc.close()
    assert got == want


def test_coalescer_closed_semantics():
    """close() releases every waiter and subsequent caption() raises
    instead of blocking forever (round-5 review finding: the old STOP
    re-post could deadlock the dispatcher on a full queue, and a
    post-close request waited on an event no worker would set)."""
    from univl_tpu.serving.coalesce import CoalescingCaptionService

    stub = _StubService(batch_size=4)
    svc = CoalescingCaptionService(stub)
    assert svc.caption([_clip(1.0)]) == ["cap:1.000:"]
    svc.close()
    with pytest.raises(RuntimeError, match="closed"):
        svc.caption([_clip(2.0)])
    # idempotent
    svc.close()


def test_index_save_load_suffixless_path(rng, tokenizer, tmp_path):
    """np.savez_compressed appends '.npz' to a suffix-less path; load()
    must accept the same path the caller saved with (round-5 review
    finding: the HTTP save/restart round-trip broke otherwise)."""
    cfg, model, params = _model_and_params(tokenizer, rng)
    idx = VideoRetrievalIndex(model, params, tokenizer, batch_size=4)
    idx.add(_videos(rng, 4, cfg.video_dim), ids=list("abcd"))
    path = str(tmp_path / "myindex")  # no .npz suffix
    idx.save(path)
    idx2 = VideoRetrievalIndex.load(path, model, params, tokenizer,
                                    batch_size=4)
    assert len(idx2) == 4
    assert idx.search(["stir"], top_k=2) == idx2.search(["stir"], top_k=2)
