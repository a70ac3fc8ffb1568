"""Independent torch oracle for converter/model parity tests.

A from-scratch torch implementation of the UniVL architecture (post-LN BERT
blocks, erf-GELU, TF LayerNorm eps=1e-12, -10000 additive masks) whose
state_dict uses the REFERENCE parameter names, so it can be fed through
univl_tpu.checkpoint.torch_convert and compared numerically against the flax
model. Written from the published architecture — not copied from the
reference implementation.
"""

from __future__ import annotations

import math

import torch
from torch import nn


def gelu(x):
    return x * 0.5 * (1.0 + torch.erf(x / math.sqrt(2.0)))


class TFLayerNorm(nn.Module):
    def __init__(self, dim, eps=1e-12):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(-1, keepdim=True)
        s = (x - u).pow(2).mean(-1, keepdim=True)
        return self.weight * ((x - u) / torch.sqrt(s + self.eps)) + self.bias


class SelfAttention(nn.Module):
    def __init__(self, hidden, heads):
        super().__init__()
        self.h = heads
        self.d = hidden // heads
        self.query = nn.Linear(hidden, hidden)
        self.key = nn.Linear(hidden, hidden)
        self.value = nn.Linear(hidden, hidden)

    def forward(self, q_in, k_in, v_in, bias):
        B, L, H = q_in.shape
        Lk = k_in.shape[1]

        def split(x, L):
            return x.view(B, L, self.h, self.d).permute(0, 2, 1, 3)

        q = split(self.query(q_in), L)
        k = split(self.key(k_in), Lk)
        v = split(self.value(v_in), Lk)
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.d) + bias
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(B, L, H)
        return ctx


class AttnOutput(nn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.dense = nn.Linear(hidden, hidden)
        self.LayerNorm = TFLayerNorm(hidden)

    def forward(self, x, residual):
        return self.LayerNorm(self.dense(x) + residual)


class Block(nn.Module):
    """Post-LN encoder block with reference submodule names."""

    def __init__(self, hidden, heads, inter):
        super().__init__()
        self.attention = nn.Module()
        self.attention.self = SelfAttention(hidden, heads)
        self.attention.output = AttnOutput(hidden)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(hidden, inter)
        self.output = nn.Module()
        self.output.dense = nn.Linear(inter, hidden)
        self.output.LayerNorm = TFLayerNorm(hidden)

    def forward(self, x, bias):
        a = self.attention.output(self.attention.self(x, x, x, bias), x)
        i = gelu(self.intermediate.dense(a))
        return self.output.LayerNorm(self.output.dense(i) + a)


def mask_bias(mask):
    return ((1.0 - mask.float()) * -10000.0)[:, None, None, :]


class TorchUniVLOracle(nn.Module):
    """Text/visual/cross towers + decoder with reference parameter names."""

    def __init__(self, cfg):
        super().__init__()
        H = cfg.bert.hidden_size
        heads = cfg.bert.num_attention_heads
        inter = cfg.bert.intermediate_size

        def tower(n_layers, prefix_obj):
            enc = nn.Module()
            enc.layer = nn.ModuleList(
                [Block(H, heads, inter) for _ in range(n_layers)]
            )
            prefix_obj.encoder = enc

        # bert
        self.bert = nn.Module()
        self.bert.embeddings = nn.Module()
        self.bert.embeddings.word_embeddings = nn.Embedding(cfg.bert.vocab_size, H)
        self.bert.embeddings.position_embeddings = nn.Embedding(
            cfg.bert.max_position_embeddings, H
        )
        self.bert.embeddings.token_type_embeddings = nn.Embedding(
            cfg.bert.type_vocab_size, H
        )
        self.bert.embeddings.LayerNorm = TFLayerNorm(H)
        tower(cfg.bert.num_hidden_layers, self.bert)

        # visual
        self.visual = nn.Module()
        self.visual.embeddings = nn.Module()
        self.visual.embeddings.word_embeddings = nn.Linear(cfg.video_dim, H)
        self.visual.embeddings.position_embeddings = nn.Embedding(
            cfg.visual.max_position_embeddings, H
        )
        self.visual.embeddings.LayerNorm = TFLayerNorm(H)
        tower(cfg.visual.num_hidden_layers, self.visual)

        # cross
        self.cross = nn.Module()
        self.cross.embeddings = nn.Module()
        self.cross.embeddings.position_embeddings = nn.Embedding(
            cfg.cross.max_position_embeddings, H
        )
        self.cross.embeddings.token_type_embeddings = nn.Embedding(
            cfg.cross.type_vocab_size, H
        )
        self.cross.embeddings.LayerNorm = TFLayerNorm(H)
        tower(cfg.cross.num_hidden_layers, self.cross)
        self.cross.pooler = nn.Module()
        self.cross.pooler.dense = nn.Linear(H, H)

        # decoder
        dec = nn.Module()
        dec.embeddings = nn.Module()
        dec.embeddings.word_embeddings = nn.Embedding(cfg.bert.vocab_size, H)
        dec.embeddings.word_embeddings.weight = (
            self.bert.embeddings.word_embeddings.weight
        )
        dec.embeddings.position_embeddings = nn.Embedding(
            cfg.bert.max_position_embeddings, H
        )
        dec.embeddings.position_embeddings.weight = (
            self.bert.embeddings.position_embeddings.weight
        )
        dec.embeddings.LayerNorm = TFLayerNorm(H)
        dec.decoder = nn.Module()
        dec.decoder.layer = nn.ModuleList()
        for _ in range(cfg.decoder.num_decoder_layers):
            layer = nn.Module()
            for name in ("slf_attn", "enc_attn"):
                att = nn.Module()
                att.att = SelfAttention(H, heads)
                att.output = AttnOutput(H)
                setattr(layer, name, att)
            layer.intermediate = nn.Module()
            layer.intermediate.dense = nn.Linear(H, inter)
            layer.output = nn.Module()
            layer.output.dense = nn.Linear(inter, H)
            layer.output.LayerNorm = TFLayerNorm(H)
            dec.decoder.layer.append(layer)
        dec.classifier = nn.Module()
        dec.classifier.cls = nn.Module()
        dec.classifier.cls.predictions = nn.Module()
        tr = nn.Module()
        tr.dense = nn.Linear(H, H)
        tr.LayerNorm = TFLayerNorm(H)
        dec.classifier.cls.predictions.transform = tr
        dec.classifier.cls.predictions.decoder = nn.Linear(H, cfg.bert.vocab_size, bias=False)
        dec.classifier.cls.predictions.decoder.weight = (
            self.bert.embeddings.word_embeddings.weight
        )
        dec.classifier.cls.predictions.bias = nn.Parameter(
            torch.zeros(cfg.bert.vocab_size)
        )
        self.decoder = dec

        self.normalize_video = nn.Module()
        self.normalize_video.visual_norm2d = TFLayerNorm(cfg.video_dim)
        self.similarity_dense = nn.Linear(H, 1)
        self.cfg = cfg

    # ---------------- forward pieces ----------------
    def encode_text(self, ids, types, mask):
        e = self.bert.embeddings
        L = ids.shape[1]
        pos = torch.arange(L)[None, :].expand_as(ids)
        x = (
            e.word_embeddings(ids)
            + e.position_embeddings(pos)
            + e.token_type_embeddings(types)
        )
        x = e.LayerNorm(x)
        b = mask_bias(mask)
        for blk in self.bert.encoder.layer:
            x = blk(x, b)
        return x

    def encode_video(self, video, mask):
        video = self.normalize_video.visual_norm2d(video)
        e = self.visual.embeddings
        L = video.shape[1]
        pos = torch.arange(L)[None, :].expand(video.shape[0], L)
        x = e.word_embeddings(video) + e.position_embeddings(pos)
        x = e.LayerNorm(x)
        b = mask_bias(mask)
        for blk in self.visual.encoder.layer:
            x = blk(x, b)
        return x

    def encode_cross(self, seq, vis, am, vm):
        feats = torch.cat([seq, vis], dim=1)
        types = torch.cat([torch.zeros_like(am), torch.ones_like(vm)], dim=1).long()
        mask = torch.cat([am, vm], dim=1)
        e = self.cross.embeddings
        L = feats.shape[1]
        pos = torch.arange(L)[None, :].expand(feats.shape[0], L)
        x = feats + e.position_embeddings(pos) + e.token_type_embeddings(types)
        x = e.LayerNorm(x)
        b = mask_bias(mask)
        for blk in self.cross.encoder.layer:
            x = blk(x, b)
        pooled = torch.tanh(self.cross.pooler.dense(x[:, 0]))
        return x, pooled, mask

    def decode(self, cap_ids, cross_out, answer_mask, enc_mask):
        e = self.decoder.embeddings
        L = cap_ids.shape[1]
        pos = torch.arange(L)[None, :].expand_as(cap_ids)
        x = e.LayerNorm(e.word_embeddings(cap_ids) + e.position_embeddings(pos))
        enc_bias = mask_bias(enc_mask)
        future = torch.triu(torch.ones(L, L), diagonal=1)[None, None]
        pad = (1.0 - answer_mask.float())[:, None, None, :]
        self_bias = ((pad + future) > 0).float() * -10000.0
        for layer in self.decoder.layer_list() if hasattr(self.decoder, "layer_list") else self.decoder.decoder.layer:
            s = layer.slf_attn.output(layer.slf_attn.att(x, x, x, self_bias), x)
            c = layer.enc_attn.output(
                layer.enc_attn.att(s, cross_out, cross_out, enc_bias), s
            )
            i = gelu(layer.intermediate.dense(c))
            x = layer.output.LayerNorm(layer.output.dense(i) + c)
        p = self.decoder.classifier.cls.predictions
        h = p.transform.LayerNorm(gelu(p.transform.dense(x)))
        return p.decoder(h) + p.bias
