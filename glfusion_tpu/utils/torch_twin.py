"""PyTorch twin of the reference Global_and_Local for checkpoint parity.

Builds the reference architecture (reference ``models/ours.py:1708-1843``)
in plain PyTorch from its documented contract — torchvision bottleneck
topology, IEKD stem (``models/_utils.py:192``), ASPP head
(``models/deeplabv3.py:102-166``), TPAVI dot attention
(``models/ours.py:770-917``) — with the reference's exact state-dict name
space (``models/ours.py:1717-1747``). Paired with
``utils/torch_convert.convert_state_dict`` it is the end-to-end evidence
that released reference checkpoints reproduce their outputs here: see
tests/test_full_model_torch_parity.py (tiny widths, every CI run) and
tests/test_full_size_parity.py (full 2048-ch rehearsal, env-gated).

This module intentionally contains no JAX: it requires only torch (CPU).
"""

from __future__ import annotations

import torch
import torch.nn as tnn

from glfusion_tpu.config import ModelConfig

class TBottleneck(tnn.Module):
    """torchvision Bottleneck (conv1/bn1/conv2/bn2/conv3/bn3/downsample)."""

    def __init__(self, cin, planes, stride=1, dilation=1, expansion=4):
        super().__init__()
        cout = planes * expansion
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride,
                                padding=dilation, dilation=dilation,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        r = self.downsample(x) if self.downsample is not None else x
        return self.relu(y + r)


def t_layer(cin, planes, blocks, stride, prev_dilation, dilation,
            expansion=4):
    mods = []
    for b in range(blocks):
        mods.append(TBottleneck(
            cin if b == 0 else planes * expansion, planes,
            stride=stride if b == 0 else 1,
            dilation=prev_dilation if b == 0 else dilation,
            expansion=expansion))
    return tnn.Sequential(*mods)


class TASPPHead(tnn.Sequential):
    """DeepLabHead per reference deeplabv3.py:102-166 name layout."""

    def __init__(self, cin, channels, rates, num_out):
        aspp = tnn.Module()
        convs = tnn.ModuleList()
        convs.append(tnn.Sequential(
            tnn.Conv2d(cin, channels, 1, bias=False),
            tnn.BatchNorm2d(channels), tnn.ReLU()))
        for r in rates:
            convs.append(tnn.Sequential(
                tnn.Conv2d(cin, channels, 3, padding=r, dilation=r,
                           bias=False),
                tnn.BatchNorm2d(channels), tnn.ReLU()))
        convs.append(tnn.Sequential(
            tnn.AdaptiveAvgPool2d(1),
            tnn.Conv2d(cin, channels, 1, bias=False),
            tnn.BatchNorm2d(channels), tnn.ReLU()))
        aspp.convs = convs
        aspp.project = tnn.Sequential(
            tnn.Conv2d((2 + len(rates)) * channels, channels, 1, bias=False),
            tnn.BatchNorm2d(channels), tnn.ReLU(), tnn.Dropout(0.0))

        def aspp_forward(x, _convs=convs, _project=aspp.project):
            res = []
            for i, conv in enumerate(_convs):
                y = conv(x)
                if i == len(_convs) - 1:  # pooling branch: upsample back
                    y = tnn.functional.interpolate(
                        y, size=x.shape[-2:], mode="bilinear",
                        align_corners=False)
                res.append(y)
            return _project(torch.cat(res, dim=1))

        aspp.forward = aspp_forward
        super().__init__(
            aspp,
            tnn.Conv2d(channels, channels, 3, padding=1, bias=False),
            tnn.BatchNorm2d(channels),
            tnn.ReLU(),
            tnn.Conv2d(channels, num_out, 1))


class TTPAVI(tnn.Module):
    """TPAVI dot mode per reference ours.py:770-917 (name layout incl.
    W_z Sequential and norm_layer)."""

    def __init__(self, c, inter):
        super().__init__()
        inter = inter or c // 2  # reference default: inter = in_channels//2
        self.theta = tnn.Conv3d(c, inter, 1)
        self.phi = tnn.Conv3d(c, inter, 1)
        self.g = tnn.Conv3d(c, inter, 1)
        self.W_z = tnn.Sequential(tnn.Conv3d(inter, c, 1),
                                  tnn.BatchNorm3d(c))
        tnn.init.constant_(self.W_z[1].weight, 0)
        tnn.init.constant_(self.W_z[1].bias, 0)
        self.norm_layer = tnn.LayerNorm(c)
        self.align_channel = tnn.Linear(128, c)  # dead audio path

    def forward(self, x):  # x: (B, C, V, H, W)
        b, c = x.shape[:2]
        g_x = self.g(x).flatten(2).permute(0, 2, 1)       # (B, N, C')
        th = self.theta(x).flatten(2).permute(0, 2, 1)
        ph = self.phi(x).flatten(2)                        # (B, C', N)
        f = torch.matmul(th, ph)
        y = torch.matmul(f / f.shape[-1], g_x)             # (B, N, C')
        y = y.permute(0, 2, 1).reshape(
            b, -1, *x.shape[2:])                           # (B, C', V, H, W)
        z = self.W_z(y) + x
        z = z.permute(0, 2, 3, 4, 1)
        z = self.norm_layer(z)
        return z.permute(0, 4, 1, 2, 3)


class TGlobalAndLocal(tnn.Module):
    """Reference Global_and_Local (ours.py:1708-1843) at tiny widths with
    the reference's exact parameter names."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        w = cfg.widths
        e = cfg.expansion
        self.init_block = tnn.ModuleDict()
        self.layer1 = tnn.ModuleDict()
        self.layer2 = tnn.ModuleDict()
        self.layer3 = tnn.ModuleDict()
        self.layer4 = tnn.ModuleDict()
        self.classifier = tnn.ModuleDict()
        self.centerness = tnn.ModuleDict()
        for v in cfg.views:
            self.init_block[v] = tnn.Sequential(
                tnn.Conv2d(1, cfg.stem_width, 7, stride=1, padding=2),
                tnn.BatchNorm2d(cfg.stem_width),
                tnn.ReLU(),
                tnn.MaxPool2d(3, stride=2, padding=1))
            self.layer1[v] = t_layer(cfg.stem_width, w[0],
                                     cfg.block_sizes[0], 1, 1, 1, e)
            self.layer2[v] = t_layer(w[0] * e, w[1], cfg.block_sizes[1],
                                     2, 1, 1, e)
            # dilated stages: stride 1, first block prev dilation
            self.layer3[v] = t_layer(w[1] * e, w[2], cfg.block_sizes[2],
                                     1, 1, 2, e)
            self.layer4[v] = t_layer(w[2] * e, w[3], cfg.block_sizes[3],
                                     1, 2, 4, e)
            self.classifier[v] = TASPPHead(w[3] * e, cfg.aspp_channels,
                                           cfg.aspp_rates, cfg.num_classes)
            self.centerness[v] = TASPPHead(w[3] * e, cfg.aspp_channels,
                                           cfg.aspp_rates, 1)
        self.global_attn = TTPAVI(w[3] * e, cfg.tpavi_inter_channels)
        self.local_attn = TTPAVI(w[3] * e, cfg.tpavi_inter_channels)

    def forward(self, x):  # x: dict view → (B, 1, H, W)
        cfg = self.cfg
        views = list(cfg.views)
        shape = x[views[0]].shape[-2:]
        f4, mask_bb, ctr, f4_local = {}, {}, {}, {}
        for v in views:
            f = self.init_block[v](x[v])
            f = self.layer1[v](f)
            f = self.layer2[v](f)
            f = self.layer3[v](f)
            f4[v] = self.layer4[v](f)
        for v in views:
            m = torch.sigmoid(self.classifier[v](f4[v]))
            mask_bb[v] = m.max(dim=1, keepdim=True).values  # ch-max trick
            ctr[v] = torch.sigmoid(self.centerness[v](f4[v]))
        for v in views:
            atten = torch.sigmoid(
                cfg.center_aware_weight * mask_bb[v] * ctr[v])
            f4_local[v] = f4[v] * atten
        gstack = torch.cat([f4[v].unsqueeze(2) for v in views], dim=2)
        gfeat = self.global_attn(gstack)
        lstack = torch.cat([f4_local[v].unsqueeze(2) for v in views], dim=2)
        lfeat = self.local_attn(lstack)
        mask, bb_out = {}, {}
        for i, v in enumerate(views):
            fusion = gfeat[:, :, i] + lfeat[:, :, i]
            m = self.classifier[v](fusion)
            mask[v] = tnn.functional.interpolate(
                m, size=shape, mode="bilinear", align_corners=False)
            bb = self.classifier[v](f4[v])
            bb_out[v] = tnn.functional.interpolate(
                bb, size=shape, mode="bilinear", align_corners=False)
        return mask, bb_out
