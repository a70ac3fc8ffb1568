"""utils: cached_path + StepTimer + config JSON loading via CLI."""

import json
import os
import tarfile

import numpy as np
import pytest

from univl_tpu.utils.file_utils import cached_path
from univl_tpu.utils.profiling import StepTimer


def test_cached_path_local(tmp_path):
    f = tmp_path / "x.txt"
    f.write_text("hi")
    assert cached_path(str(f)) == str(f)
    assert cached_path(f"file://{f}") == str(f)


def test_cached_path_remote_raises(tmp_path):
    with pytest.raises(OSError, match="zero-egress"):
        cached_path("https://example.com/model.tar.gz")


def test_cached_path_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "nope"))


def test_cached_path_extracts_tar(tmp_path):
    src = tmp_path / "m"
    src.mkdir()
    (src / "config.json").write_text("{}")
    tar_path = tmp_path / "model.tar.gz"
    with tarfile.open(tar_path, "w:gz") as t:
        t.add(src / "config.json", arcname="config.json")
    out1 = cached_path(str(tar_path), cache_dir=str(tmp_path / "cache"))
    assert os.path.exists(os.path.join(out1, "config.json"))
    out2 = cached_path(str(tar_path), cache_dir=str(tmp_path / "cache"))
    assert out1 == out2  # cached, not re-extracted


def test_step_timer():
    t = StepTimer(alpha=0.5)
    assert t.tick(4) is None
    assert t.tick(4) is not None
    assert t.items_per_sec > 0


def test_cli_json_config_loading(tmp_path):
    """--bert_model pointing at a dir with bert_config.json loads it
    (reference until_config semantics), with CLI layer override on top."""
    from univl_tpu.cli.common import base_parser, build_config, finalize_args

    d = tmp_path / "bert-base"
    d.mkdir()
    (d / "bert_config.json").write_text(json.dumps({
        "vocab_size": 999, "hidden_size": 96, "num_hidden_layers": 7,
        "num_attention_heads": 4, "intermediate_size": 222,
        "max_position_embeddings": 512, "type_vocab_size": 2,
    }))
    args = base_parser("t").parse_args([
        "--do_eval", "--output_dir", str(tmp_path / "o"),
        "--bert_model", str(d), "--text_num_hidden_layers", "3",
        "--max_words", "16", "--max_frames", "12",
    ])
    args = finalize_args(args)
    cfg = build_config(args)
    assert cfg.bert.vocab_size == 999
    assert cfg.bert.hidden_size == 96
    assert cfg.bert.num_hidden_layers == 3  # CLI override wins
    assert cfg.bert.intermediate_size == 222
