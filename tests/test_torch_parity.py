"""Golden parity: torch oracle -> state_dict -> converter -> flax model.

The strongest correctness anchor available without the real
univl.pretrained.bin: a random-init torch model with reference parameter
names must produce (to fp32 tolerance) identical activations through the
converted flax model, end to end: text/visual towers, cross pooled output,
joint similarity, decoder logits.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from univl_tpu.checkpoint.torch_convert import convert_torch_state_dict, merge_params
from univl_tpu.config import UniVLConfig
from univl_tpu.models.univl import UniVL

from test_model import make_batch
from torch_oracle import TorchUniVLOracle


@pytest.fixture(scope="module")
def setup():
    cfg = UniVLConfig.tiny(stage_two=True, task_type="caption")
    torch.manual_seed(0)
    oracle = TorchUniVLOracle(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    tree, report = convert_torch_state_dict(sd)
    assert not report["unknown"], report["unknown"]

    model = UniVL(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(cfg, rng, with_caption=True)
    variables = model.init(jax.random.key(0), batch, deterministic=True)
    params, missing = merge_params(variables["params"], tree)
    assert not missing, missing
    return cfg, oracle, model, {"params": params}, batch


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


def test_encoder_parity(setup):
    cfg, oracle, model, params, batch = setup
    seq_j, vis_j = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    with torch.no_grad():
        seq_t = oracle.encode_text(
            _t(batch["input_ids"]).long(), _t(batch["token_type_ids"]).long(),
            _t(batch["attention_mask"]),
        )
        vis_t = oracle.encode_video(_t(batch["video"]), _t(batch["video_mask"]))
    np.testing.assert_allclose(np.asarray(seq_j), seq_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vis_j), vis_t.numpy(), rtol=1e-4, atol=1e-4)


def test_cross_and_similarity_parity(setup):
    cfg, oracle, model, params, batch = setup
    seq_j, vis_j = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    cross_j, pooled_j, _ = model.apply(
        params, seq_j, vis_j, batch["attention_mask"], batch["video_mask"],
        method=UniVL.get_cross_output,
    )
    with torch.no_grad():
        seq_t = oracle.encode_text(
            _t(batch["input_ids"]).long(), _t(batch["token_type_ids"]).long(),
            _t(batch["attention_mask"]),
        )
        vis_t = oracle.encode_video(_t(batch["video"]), _t(batch["video_mask"]))
        cross_t, pooled_t, _ = oracle.encode_cross(
            seq_t, vis_t, _t(batch["attention_mask"]), _t(batch["video_mask"])
        )
    np.testing.assert_allclose(np.asarray(cross_j), cross_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled_j), pooled_t.numpy(), rtol=1e-4, atol=1e-4)


def test_decoder_logits_parity(setup):
    cfg, oracle, model, params, batch = setup
    seq_j, vis_j = model.apply(
        params, batch["input_ids"], batch["token_type_ids"],
        batch["attention_mask"], batch["video"], batch["video_mask"],
        method=UniVL.encode,
    )
    logits_j = model.apply(
        params, seq_j, vis_j, batch["attention_mask"], batch["video_mask"],
        batch["input_caption_ids"], batch["decoder_mask"],
        method=UniVL.decoder_logits,
    )
    with torch.no_grad():
        seq_t = oracle.encode_text(
            _t(batch["input_ids"]).long(), _t(batch["token_type_ids"]).long(),
            _t(batch["attention_mask"]),
        )
        vis_t = oracle.encode_video(_t(batch["video"]), _t(batch["video_mask"]))
        cross_t, _, concat_mask_t = oracle.encode_cross(
            seq_t, vis_t, _t(batch["attention_mask"]), _t(batch["video_mask"])
        )
        logits_t = oracle.decode(
            _t(batch["input_caption_ids"]).long(), cross_t,
            _t(batch["decoder_mask"]), concat_mask_t,
        )
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), rtol=1e-3, atol=2e-3
    )
