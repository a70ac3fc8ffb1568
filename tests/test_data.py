"""Data pipeline tests: tokenizer, masking invariants, dataset readers,
batching — against the synthetic fixtures."""

import numpy as np
import pytest

from univl_tpu.data import fixtures
from univl_tpu.data.batching import Batcher, collate
from univl_tpu.data.howto100m import HowTo100MPretrainDataset
from univl_tpu.data.msrvtt import (
    MsrvttCaptionDataset,
    MsrvttRetrievalEvalDataset,
    MsrvttRetrievalTrainDataset,
)
from univl_tpu.data.tokenization import WordPieceTokenizer
from univl_tpu.data import text_encoding as te
from univl_tpu.data.youcook import YoucookCaptionDataset, YoucookRetrievalDataset

import pickle


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    return fixtures.make_vocab(str(tmp_path_factory.mktemp("vocab") / "vocab.txt"))


@pytest.fixture(scope="module")
def tokenizer(vocab_file):
    return WordPieceTokenizer(vocab_file)


# ------------------------------------------------------------------ #
# Tokenizer
# ------------------------------------------------------------------ #
def test_tokenizer_basic(tokenizer):
    toks = tokenizer.tokenize("Add the chopped onions, then STIR well!")
    assert "add" in toks and "," in toks and "!" in toks
    assert "stir" in toks
    ids = tokenizer.convert_tokens_to_ids(toks)
    assert tokenizer.convert_ids_to_tokens(ids) == toks


def test_tokenizer_wordpiece_fallback(tokenizer):
    # 'stirred' is not in vocab; must decompose via ## pieces or UNK
    toks = tokenizer.tokenize("stirred")
    assert all(t in tokenizer.vocab for t in toks)


def test_tokenizer_unknown_to_unk(tokenizer):
    toks = tokenizer.tokenize("Ωmega")  # char not in vocab
    assert "[UNK]" in toks


def test_tokenizer_specials(tokenizer):
    assert tokenizer.pad_id == 0
    assert tokenizer.bos_id == tokenizer.vocab["[CLS]"]
    assert tokenizer.eos_id == tokenizer.vocab["[SEP]"]


# ------------------------------------------------------------------ #
# Encoding invariants
# ------------------------------------------------------------------ #
def test_encode_text_invariants(tokenizer):
    rng = np.random.RandomState(0)
    out = te.encode_text("add the onions " * 30, tokenizer, 16, rng)
    assert out["input_ids"].shape == (16,)
    assert out["input_ids"][0] == tokenizer.bos_id
    # truncated sequence still ends with SEP at the last valid position
    last = int(out["attention_mask"].sum()) - 1
    assert out["input_ids"][last] == tokenizer.eos_id
    assert last == 15  # full
    # labels: CLS/SEP/pad are -1
    assert out["token_labels"][0] == -1
    assert out["token_labels"][last] == -1


def test_mlm_rate(tokenizer):
    rng = np.random.RandomState(1)
    n_masked = total = 0
    for i in range(200):
        out = te.encode_text(" ".join(["add"] * 30), tokenizer, 32, rng)
        valid = out["attention_mask"].sum() - 2
        n_masked += (out["token_labels"] != -1).sum()
        total += valid
    rate = n_masked / total
    assert 0.12 < rate < 0.18, rate


def test_encode_caption_shift(tokenizer):
    words = tokenizer.tokenize("add the onions")
    cap = te.encode_caption(words, tokenizer, 8)
    ids_in = cap["input_caption_ids"]
    ids_out = cap["output_caption_ids"]
    n = int(cap["decoder_mask"].sum())
    assert ids_in[0] == tokenizer.bos_id
    assert ids_out[n - 1] == tokenizer.eos_id
    # shifted by one
    np.testing.assert_array_equal(ids_in[1:n], ids_out[: n - 1])


def test_mask_frames_rate():
    rng = np.random.RandomState(2)
    video = np.ones((1000, 4), np.float32)
    masked, labels = te.mask_frames(video, 1000, rng)
    rate = (labels != -1).mean()
    assert 0.10 < rate < 0.20
    assert (masked[labels != -1] == 0).all()


# ------------------------------------------------------------------ #
# Datasets
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def youcook(tmp_path_factory):
    return fixtures.make_youcook(str(tmp_path_factory.mktemp("yc")), video_dim=16)


def test_youcook_retrieval(youcook, tokenizer):
    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    assert len(ds) == 6 * 3
    s = ds[0]
    assert s["video"].shape == (12, 16)
    assert s["video_mask"].sum() > 0
    assert s["input_ids"].dtype == np.int32
    # determinism given same epoch
    s2 = ds[0]
    np.testing.assert_array_equal(s["masked_text"], s2["masked_text"])
    ds.set_epoch(1)
    s3 = ds[0]
    assert not np.array_equal(s["masked_text"], s3["masked_text"]) or \
        (s["token_labels"] == -1).all()


def test_youcook_caption(youcook, tokenizer):
    csv_path, data_path, feat_path = youcook
    ds = YoucookCaptionDataset(csv_path, data_path, feat_path, tokenizer,
                               max_words=16, max_frames=12)
    s = ds[0]
    for k in ("input_caption_ids", "output_caption_ids", "decoder_mask"):
        assert k in s
    assert isinstance(ds.reference_caption(0), str)


@pytest.fixture(scope="module")
def msrvtt(tmp_path_factory):
    return fixtures.make_msrvtt(str(tmp_path_factory.mktemp("mv")), video_dim=16)


def test_msrvtt_loaders(msrvtt, tokenizer):
    train_csv, test_csv, json_path, feat_path = msrvtt
    ev = MsrvttRetrievalEvalDataset(test_csv, feat_path, tokenizer,
                                    max_words=16, max_frames=12)
    assert len(ev) == 8
    assert ev[0]["video"].shape == (12, 16)

    tr = MsrvttRetrievalTrainDataset(train_csv, json_path, feat_path, tokenizer,
                                     max_words=16, max_frames=12,
                                     unfold_sentences=True)
    assert len(tr) == 8 * 3  # expanded
    tr2 = MsrvttRetrievalTrainDataset(train_csv, json_path, feat_path, tokenizer,
                                      max_words=16, max_frames=12,
                                      unfold_sentences=False)
    assert len(tr2) == 8
    _ = tr2[0]


def test_msrvtt_caption_empty_text(msrvtt, tokenizer):
    _, _, json_path, feat_path = msrvtt
    ds = MsrvttCaptionDataset("/dev/null", json_path, feat_path, tokenizer,
                              split_type="train", max_words=16, max_frames=12)
    # our fixture ids are video0..7 -> all in "train" range
    s = ds[0]
    # encoder text empty: [CLS][SEP] only
    assert int(s["attention_mask"].sum()) == 2
    assert len(ds.references(0)) == 3


@pytest.fixture(scope="module")
def howto(tmp_path_factory):
    return fixtures.make_howto100m(str(tmp_path_factory.mktemp("ht")), video_dim=16)


def test_howto_pretrain_mil(howto, tokenizer):
    csv_path, data_path, feat_dir = howto
    with open(data_path, "rb") as f:
        data = pickle.load(f)
    ds = HowTo100MPretrainDataset(
        csv_path, data, feat_dir, tokenizer,
        max_words=16, max_frames=12, n_pair=3, min_time=5.0,
        sampled_use_mil=True, video_dim=16,
    )
    assert len(ds) == 5  # one sample per video when sampled_use_mil
    s = ds[0]
    assert s["input_ids"].shape == (3, 16)  # n_pair leading dim
    assert s["video"].shape == (3, 12, 16)
    for k in ("masked_text", "token_labels", "input_caption_ids",
              "output_caption_ids", "decoder_mask", "masked_video",
              "video_labels_index"):
        assert k in s


def test_howto_corrupt_video_tolerated(howto, tokenizer):
    csv_path, data_path, feat_dir = howto
    with open(data_path, "rb") as f:
        data = pickle.load(f)
    ds = HowTo100MPretrainDataset(
        csv_path, data, feat_dir, tokenizer,
        max_words=16, max_frames=12, n_pair=1, video_dim=16,
    )
    s = ds[len(ds) - 1]  # last video has a corrupt .npy
    assert (s["video"] == 0).all()
    assert (s["video_mask"] == 0).all()


def test_howto_enumerated_mil(howto, tokenizer):
    csv_path, data_path, feat_dir = howto
    with open(data_path, "rb") as f:
        data = pickle.load(f)
    ds = HowTo100MPretrainDataset(
        csv_path, data, feat_dir, tokenizer,
        max_words=16, max_frames=12, n_pair=3, use_mil=True, video_dim=16,
    )
    # 6 clips per video, groups of 3 -> 2 groups per video x 5 videos
    assert len(ds) == 10


def test_howto_only_sim(howto, tokenizer):
    csv_path, data_path, feat_dir = howto
    with open(data_path, "rb") as f:
        data = pickle.load(f)
    ds = HowTo100MPretrainDataset(
        csv_path, data, feat_dir, tokenizer,
        max_words=16, max_frames=12, n_pair=1, only_sim=True, video_dim=16,
    )
    s = ds[0]
    assert "masked_text" not in s and "input_caption_ids" not in s


# ------------------------------------------------------------------ #
# Batching
# ------------------------------------------------------------------ #
def test_batcher_shapes_and_determinism(youcook, tokenizer):
    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    b = Batcher(ds, batch_size=4, shuffle=True, seed=7, grad_accum=2)
    batches = list(b.epoch(0))
    assert len(batches) == len(ds) // 8
    assert batches[0]["input_ids"].shape == (2, 4, 16)
    batches2 = list(b.epoch(0))
    np.testing.assert_array_equal(batches[0]["input_ids"], batches2[0]["input_ids"])
    batches3 = list(b.epoch(1))
    assert not np.array_equal(batches[0]["input_ids"], batches3[0]["input_ids"])


def test_batcher_start_batch_resume(youcook, tokenizer):
    """epoch(e, start_batch=k) yields exactly batches k.. of epoch(e) —
    the mid-epoch-resume contract (cli/pretrain.py exact preemption
    resume)."""
    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    b = Batcher(ds, batch_size=4, shuffle=True, seed=7, grad_accum=2)
    full = list(b.epoch(0))
    assert len(full) >= 2
    for k in (1, len(full) - 1, len(full)):
        tail = list(b.epoch(0, start_batch=k))
        assert len(tail) == len(full) - k
        for f, t in zip(full[k:], tail):
            np.testing.assert_array_equal(f["input_ids"], t["input_ids"])
            np.testing.assert_array_equal(f["video"], t["video"])


def test_prefetch(youcook, tokenizer):
    from univl_tpu.data.batching import prefetch_to_device
    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    b = Batcher(ds, batch_size=4, shuffle=False)
    out = list(prefetch_to_device(b.epoch(0), put=lambda x: x))
    assert len(out) == len(ds) // 4


def test_batcher_process_sharding(youcook, tokenizer):
    """Per-host slices must partition the global batch deterministically."""
    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    full = Batcher(ds, batch_size=8, shuffle=True, seed=3, grad_accum=2)
    parts = [
        Batcher(ds, batch_size=8, shuffle=True, seed=3, grad_accum=2,
                process_index=i, process_count=2)
        for i in range(2)
    ]
    fb = list(full.epoch(0))
    p0 = list(parts[0].epoch(0))
    p1 = list(parts[1].epoch(0))
    assert len(fb) == len(p0) == len(p1)
    for f, a, b in zip(fb, p0, p1):
        merged = np.concatenate([a["input_ids"], b["input_ids"]], axis=1)
        np.testing.assert_array_equal(f["input_ids"], merged)


def test_howto_transcript_expansion(howto, tokenizer):
    """Neighbor-merge grows short clips to min_time (reference :230-256)."""
    csv_path, data_path, feat_dir = howto
    with open(data_path, "rb") as f:
        data = pickle.load(f)
    ds = HowTo100MPretrainDataset(
        csv_path, data, feat_dir, tokenizer,
        max_words=32, max_frames=12, n_pair=1, min_time=1e9,  # force max merge
        video_dim=16,
    )
    d = data[ds.video_ids[0]]
    words, s, e = ds._single_transcript(d, 0)
    # merged to the full video span
    assert s == float(d["start"][0])
    assert e == float(d["end"][len(d["end"]) - 1])
    # no expansion when min_time tiny
    ds2 = HowTo100MPretrainDataset(
        csv_path, data, feat_dir, tokenizer,
        max_words=32, max_frames=12, n_pair=1, min_time=0.0, min_words=0,
        video_dim=16,
    )
    w2, s2, e2 = ds2._single_transcript(d, 1)
    assert s2 == float(d["start"][1]) and e2 == float(d["end"][1])


def test_howto_empty_slice_window_growth(tokenizer, tmp_path):
    """A clip mapping to an empty feature range must grow its window
    outward until non-empty (reference :258-285)."""
    import numpy as np
    from univl_tpu.data.howto100m import HowTo100MPretrainDataset

    # video with 10 feature rows; clip 1 spans [20, 21) -> empty slice
    feat_dir = tmp_path / "f"
    feat_dir.mkdir()
    np.save(feat_dir / "v0.npy", np.ones((10, 4), np.float32))
    csv_path = tmp_path / "c.csv"
    csv_path.write_text("video_id,feature_file\nv0,v0.npy\n")
    data = {"v0": {
        "start": np.array([0.0, 20.0], dtype=object),
        "end": np.array([5.0, 21.0], dtype=object),
        "text": np.array(["add the onions", "stir well"], dtype=object),
    }}
    # Growth happens WITHIN a multi-clip sample (reference semantics:
    # _expand_video_slice can only use the sample's own start/end arrays;
    # single-clip samples break immediately, reference :268-269).
    ds = HowTo100MPretrainDataset(
        str(csv_path), data, str(feat_dir), tokenizer,
        max_words=16, max_frames=8, n_pair=2, min_time=0.0,
        with_long_context=False, video_dim=4, use_mil=True,
    )
    s = ds[0]  # group [0, 1]: clip 1 maps to empty range, grows into clip 0
    assert s["video_mask"][1].sum() > 0, "window growth failed"
    assert s["video_mask"][0].sum() > 0


def test_prefetch_propagates_errors(youcook, tokenizer):
    """Background-thread exceptions must surface to the consumer."""
    from univl_tpu.data.batching import prefetch_to_device

    def boom():
        yield {"a": np.zeros(1)}
        raise RuntimeError("reader died")

    it = prefetch_to_device(boom(), put=lambda x: x)
    next(it)
    with pytest.raises(RuntimeError, match="reader died"):
        list(it)


def test_tokenizer_rejects_bad_vocab(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("hello\nworld\n")
    with pytest.raises(ValueError, match="special tokens"):
        WordPieceTokenizer(str(p))
    p2 = tmp_path / "dup.txt"
    p2.write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\nfoo\nfoo\n")
    with pytest.raises(ValueError, match="duplicate"):
        WordPieceTokenizer(str(p2))


def test_cast_floats_and_prefetch_modes():
    import ml_dtypes
    from univl_tpu.data.batching import cast_floats, prefetch_to_device

    batch = {
        "video": np.random.randn(2, 3, 4).astype(np.float32),
        "ids": np.ones((2, 3), np.int32),
    }
    out = cast_floats(batch, "bfloat16")
    assert out["video"].dtype == ml_dtypes.bfloat16
    assert out["ids"].dtype == np.int32
    np.testing.assert_allclose(
        out["video"].astype(np.float32), batch["video"], rtol=8e-3
    )
    assert cast_floats(batch, "float32")["video"].dtype == np.float32

    # both prefetch modes deliver every item, in order, through `put`
    for put_in_worker in (True, False):
        got = list(
            prefetch_to_device(
                iter(range(7)), put=lambda x: x * 2, put_in_worker=put_in_worker
            )
        )
        assert got == [0, 2, 4, 6, 8, 10, 12]

    # errors from the producer still propagate in consumer-put mode
    def bad():
        yield 1
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(bad(), put=lambda x: x, put_in_worker=False))


def test_batcher_partial_final_chunk_accum_and_hosts(youcook, tokenizer):
    """drop_last=False with grad_accum>1 / process_count>1 used to crash
    on the final partial chunk's reshape (round-5 review finding); the
    remainder now wrap-pads with epoch-start indices (torch
    DistributedSampler's equal-size padding) so every micro-batch keeps
    its static shape."""
    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    n = len(ds)
    # pick sizes that leave a remainder
    bs, ga = 4, 2
    assert n % (bs * ga) != 0, "fixture must leave a partial final chunk"
    b = Batcher(ds, batch_size=bs, shuffle=False, drop_last=False, grad_accum=ga)
    batches = list(b.epoch(0))
    assert len(batches) == -(-n // (bs * ga)) == len(b)
    for bt in batches:
        assert bt["input_ids"].shape == (ga, bs, 16)

    parts = [
        Batcher(ds, batch_size=bs, shuffle=False, drop_last=False,
                process_index=i, process_count=2)
        for i in range(2)
    ]
    for p in parts:
        for bt in p.epoch(0):
            assert bt["input_ids"].shape == (bs // 2, 16)


def test_prefetch_early_close_terminates_worker(youcook, tokenizer):
    """Abandoning the prefetch iterator mid-epoch (preemption return /
    break) must terminate the worker thread instead of leaving it blocked
    forever in q.put holding prefetched batches (round-5 review
    finding)."""
    import threading

    from univl_tpu.data.batching import prefetch_to_device

    csv_path, data_path, feat_path = youcook
    ds = YoucookRetrievalDataset(csv_path, data_path, feat_path, tokenizer,
                                 max_words=16, max_frames=12)
    b = Batcher(ds, batch_size=2, shuffle=False)
    before = {t.ident for t in threading.enumerate()}
    it = prefetch_to_device(b.epoch(0), put=lambda x: x, size=1)
    next(it)
    it.close()  # triggers the generator's finally -> stop + drain
    deadline = __import__("time").time() + 10
    while __import__("time").time() < deadline:
        extra = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not extra:
            break
        __import__("time").sleep(0.1)
    assert not extra, f"prefetch worker leaked: {extra}"
