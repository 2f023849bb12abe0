"""Validation-only torch DETR replica for converter/numerics tests.

Implements the facebookresearch/detr `detr_resnet101` architecture that the
reference loads via torch.hub (reference utils.py:88-120) with plain torch
modules — torchvision-style Bottleneck ResNet, torch.nn.MultiheadAttention
post-norm transformer, sine position embeddings — using the hub model's
exact state-dict key names so `convert_detr_state_dict` consumes
`state_dict()` directly.  No network access, no torchvision: every block is
written out here.  This file exists purely so tests can prove that
models/detr.py + models/weights.py reproduce the torch architecture's
numerics; it is not part of the framework.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on conv2), BN in eval mode ==
    frozen running stats."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


class ResNetBody(nn.Module):
    """ResNet trunk to C5; `blocks` defaults to the 101 layout."""

    def __init__(self, blocks=(3, 4, 23, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for stage, (planes, n, stride) in enumerate(zip(
                (64, 128, 256, 512), blocks, (1, 2, 2, 2))):
            layers = [Bottleneck(inplanes, planes, stride, downsample=True)]
            inplanes = planes * 4
            layers += [Bottleneck(inplanes, planes) for _ in range(n - 1)]
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x


class _BackboneJoiner(nn.Module):
    """Produces the hub model's `backbone.0.body.*` key prefix."""

    def __init__(self, blocks):
        super().__init__()
        self.body = ResNetBody(blocks)


def sine_position_embedding(valid_mask, num_pos_feats=128,
                            temperature=10000.0):
    """DETR PositionEmbeddingSine (normalize=True, scale 2*pi).
    valid_mask: (B, H, W) bool, True = real pixels.  Returns (B, 2F, H, W).
    """
    not_mask = valid_mask.double()
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float64)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(),
                         pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(),
                         pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


class EncoderLayer(nn.Module):
    def __init__(self, d_model, nhead, dim_ff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, nhead)
        self.linear1 = nn.Linear(d_model, dim_ff)
        self.linear2 = nn.Linear(dim_ff, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, src, pos, key_padding_mask):
        q = k = src + pos
        src2 = self.self_attn(q, k, value=src,
                              key_padding_mask=key_padding_mask)[0]
        src = self.norm1(src + src2)
        src2 = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + src2)


class DecoderLayer(nn.Module):
    def __init__(self, d_model, nhead, dim_ff):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d_model, nhead)
        self.multihead_attn = nn.MultiheadAttention(d_model, nhead)
        self.linear1 = nn.Linear(d_model, dim_ff)
        self.linear2 = nn.Linear(dim_ff, d_model)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm3 = nn.LayerNorm(d_model)

    def forward(self, tgt, memory, pos, query_pos, key_padding_mask):
        q = k = tgt + query_pos
        tgt2 = self.self_attn(q, k, value=tgt)[0]
        tgt = self.norm1(tgt + tgt2)
        tgt2 = self.multihead_attn(tgt + query_pos, memory + pos,
                                   value=memory,
                                   key_padding_mask=key_padding_mask)[0]
        tgt = self.norm2(tgt + tgt2)
        tgt2 = self.linear2(F.relu(self.linear1(tgt)))
        return self.norm3(tgt + tgt2)


class _Encoder(nn.Module):
    def __init__(self, d_model, nhead, dim_ff, n):
        super().__init__()
        self.layers = nn.ModuleList(
            EncoderLayer(d_model, nhead, dim_ff) for _ in range(n))


class _Decoder(nn.Module):
    def __init__(self, d_model, nhead, dim_ff, n):
        super().__init__()
        self.layers = nn.ModuleList(
            DecoderLayer(d_model, nhead, dim_ff) for _ in range(n))
        self.norm = nn.LayerNorm(d_model)


class _Transformer(nn.Module):
    def __init__(self, d_model, nhead, dim_ff, n_enc, n_dec):
        super().__init__()
        self.encoder = _Encoder(d_model, nhead, dim_ff, n_enc)
        self.decoder = _Decoder(d_model, nhead, dim_ff, n_dec)


class _BoxMLP(nn.Module):
    def __init__(self, d_model):
        super().__init__()
        self.layers = nn.ModuleList([nn.Linear(d_model, d_model),
                                     nn.Linear(d_model, d_model),
                                     nn.Linear(d_model, 4)])

    def forward(self, x):
        for i, lyr in enumerate(self.layers):
            x = lyr(x) if i == 2 else F.relu(lyr(x))
        return x


class TorchDETR(nn.Module):
    """Hub-named DETR: state_dict() keys match facebookresearch/detr."""

    def __init__(self, num_classes=151, num_queries=100, d_model=256,
                 nhead=8, dim_ff=2048, n_enc=6, n_dec=6,
                 blocks=(3, 4, 23, 3)):
        super().__init__()
        self.d_model = d_model
        self.backbone = nn.ModuleList([_BackboneJoiner(blocks)])
        self.input_proj = nn.Conv2d(2048, d_model, 1)
        self.transformer = _Transformer(d_model, nhead, dim_ff, n_enc,
                                        n_dec)
        self.query_embed = nn.Embedding(num_queries, d_model)
        self.class_embed = nn.Linear(d_model, num_classes)
        self.bbox_embed = _BoxMLP(d_model)

    def encode(self, images, valid_mask):
        """images: (B, 3, H, W); valid_mask: (B, H, W) True = real pixel.
        Returns (memory (HW, B, C), pos, kpm, (h, w))."""
        feat = self.backbone[0].body(images)
        b, c, h, w = feat.shape
        fmask = F.interpolate(valid_mask[:, None].double(),
                              size=(h, w)).bool()[:, 0]
        pos = sine_position_embedding(fmask, self.d_model // 2)
        src = self.input_proj(feat).flatten(2).permute(2, 0, 1)
        pos = pos.flatten(2).permute(2, 0, 1)
        kpm = ~fmask.flatten(1)          # torch convention: True = pad
        memory = src
        for layer in self.transformer.encoder.layers:
            memory = layer(memory, pos, kpm)
        return memory, pos, kpm, (h, w)

    def encode_features(self, images, valid_mask):
        memory, _, _, (h, w) = self.encode(images, valid_mask)
        return memory.permute(1, 2, 0).reshape(
            images.shape[0], self.d_model, h, w)

    def forward(self, images, valid_mask):
        memory, pos, kpm, _ = self.encode(images, valid_mask)
        q = self.query_embed.weight[:, None].expand(
            -1, images.shape[0], -1)
        tgt = torch.zeros_like(q)
        for layer in self.transformer.decoder.layers:
            tgt = layer(tgt, memory, pos, q, kpm)
        hs = self.transformer.decoder.norm(tgt).transpose(0, 1)
        return {"pred_logits": self.class_embed(hs),
                "pred_boxes": self.bbox_embed(hs).sigmoid()}


def randomize_bn_stats(model, generator=None):
    """Random running stats so eval-mode BN actually exercises the
    mean/var folding in FrozenBatchNorm conversion."""
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5, generator=generator)
            mod.running_var.uniform_(0.5, 2.0, generator=generator)
