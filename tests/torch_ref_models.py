"""Miniature PyTorch reference models with OFFICIAL checkpoint naming.

Each class reproduces the state-dict key layout and forward semantics of the
upstream implementation its family's checkpoints come from (torchvision for
DenseNet/ShuffleNetV2/EfficientNet; facebookresearch/ConvNeXt;
DingXiaoH/RepVGG; pycls for RegNet; microsoft/Swin-Transformer; openai/CLIP)
at reduced depth/width, so torch→Flax conversion can be forward-parity
tested without the (unavailable) pretrained weights. Reference semantics:
``saver.pretrain`` warm-start (reference
exprs/robust_baseline_exp/resnet/resnet50/config.yaml:69-79).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def jitter_bn_stats(net: nn.Module, seed: int = 0) -> None:
    """Randomize running stats so BN folding/conversion is non-trivial."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.1, 0.1, generator=g)
                m.running_var.uniform_(0.9, 1.1, generator=g)


# --------------------------------------------------------------------------
# DenseNet (torchvision naming: features.denseblockB.denselayerL.*)
# --------------------------------------------------------------------------


class TVDenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        out = self.conv1(F.relu(self.norm1(x)))
        out = self.conv2(F.relu(self.norm2(out)))
        return torch.cat([x, out], 1)


class TVDenseNet(nn.Module):
    def __init__(self, block_config=(2, 2, 2), growth=8, init_feat=16,
                 num_classes=10):
        super().__init__()
        features = nn.Sequential()
        features.add_module(
            "conv0", nn.Conv2d(3, init_feat, 7, 2, 3, bias=False)
        )
        features.add_module("norm0", nn.BatchNorm2d(init_feat))
        ch = init_feat
        for bi, n in enumerate(block_config):
            block = nn.Sequential()
            for li in range(n):
                block.add_module(
                    f"denselayer{li + 1}", TVDenseLayer(ch, growth)
                )
                ch += growth
            features.add_module(f"denseblock{bi + 1}", block)
            if bi != len(block_config) - 1:
                tr = nn.Sequential()
                tr.add_module("norm", nn.BatchNorm2d(ch))
                tr.add_module("conv", nn.Conv2d(ch, ch // 2, 1, bias=False))
                features.add_module(f"transition{bi + 1}", tr)
                ch = ch // 2
        features.add_module("norm5", nn.BatchNorm2d(ch))
        self.features = features
        self.classifier = nn.Linear(ch, num_classes)

    def forward(self, x):
        f = self.features
        x = F.max_pool2d(F.relu(f.norm0(f.conv0(x))), 3, 2, 1)
        for bi in range(1, 4):
            if not hasattr(f, f"denseblock{bi}"):
                break
            x = getattr(f, f"denseblock{bi}")(x)
            if hasattr(f, f"transition{bi}"):
                tr = getattr(f, f"transition{bi}")
                x = tr.conv(F.relu(tr.norm(x)))
                x = F.avg_pool2d(x, 2, 2)
        x = F.relu(f.norm5(x))
        x = x.mean([2, 3])
        return self.classifier(x)


# --------------------------------------------------------------------------
# ShuffleNetV2 (torchvision naming: conv1/stageS.I.branchB.J/conv5/fc)
# --------------------------------------------------------------------------


def tv_channel_shuffle(x, groups=2):
    b, c, h, w = x.shape
    x = x.view(b, groups, c // groups, h, w).transpose(1, 2).contiguous()
    return x.view(b, c, h, w)


class TVShuffleUnit(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        branch = oup // 2
        if stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, branch, 1, bias=False),
                nn.BatchNorm2d(branch),
                nn.ReLU(inplace=True),
            )
        b2_in = inp if stride > 1 else branch
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2_in, branch, 1, bias=False),
            nn.BatchNorm2d(branch),
            nn.ReLU(inplace=True),
            nn.Conv2d(branch, branch, 3, stride, 1, groups=branch, bias=False),
            nn.BatchNorm2d(branch),
            nn.Conv2d(branch, branch, 1, bias=False),
            nn.BatchNorm2d(branch),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), 1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), 1)
        return tv_channel_shuffle(out, 2)


class TVShuffleNetV2(nn.Module):
    def __init__(self, stage_channels=(48, 96, 192, 1024),
                 stage_repeats=(4, 8, 4), num_classes=10):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 24, 3, 2, 1, bias=False),
            nn.BatchNorm2d(24),
            nn.ReLU(inplace=True),
        )
        inp = 24
        for si, (c, n) in enumerate(zip(stage_channels[:3], stage_repeats)):
            seq = [TVShuffleUnit(inp, c, 2)]
            for _ in range(n - 1):
                seq.append(TVShuffleUnit(c, c, 1))
            setattr(self, f"stage{si + 2}", nn.Sequential(*seq))
            inp = c
        self.conv5 = nn.Sequential(
            nn.Conv2d(inp, stage_channels[3], 1, bias=False),
            nn.BatchNorm2d(stage_channels[3]),
            nn.ReLU(inplace=True),
        )
        self.fc = nn.Linear(stage_channels[3], num_classes)

    def forward(self, x):
        x = F.max_pool2d(self.conv1(x), 3, 2, 1)
        x = self.stage2(x)
        x = self.stage3(x)
        x = self.stage4(x)
        x = self.conv5(x)
        return self.fc(x.mean([2, 3]))


# --------------------------------------------------------------------------
# ConvNeXt (facebookresearch naming: downsample_layers/stages/norm/head)
# --------------------------------------------------------------------------


class FBLayerNorm(nn.Module):
    """channels_first LayerNorm (facebook ConvNeXt utility)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class FBGRN(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gamma = nn.Parameter(torch.zeros(1, 1, 1, dim))
        self.beta = nn.Parameter(torch.zeros(1, 1, 1, dim))

    def forward(self, x):  # NHWC
        gx = torch.norm(x, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        return self.gamma * (x * nx) + self.beta + x


class FBConvNeXtBlock(nn.Module):
    def __init__(self, dim, use_grn=False, ls_init=1e-6):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.grn = FBGRN(4 * dim) if use_grn else None
        self.gamma = (
            nn.Parameter(ls_init * torch.ones(dim)) if not use_grn else None
        )

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = F.gelu(x)
        if self.grn is not None:
            x = self.grn(x)
        x = self.pwconv2(x)
        if self.gamma is not None:
            x = self.gamma * x
        return inp + x.permute(0, 3, 1, 2)


class FBConvNeXt(nn.Module):
    def __init__(self, depths=(2, 2, 2, 2), dims=(32, 64, 128, 256),
                 use_grn=False, num_classes=10):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(
            nn.Sequential(nn.Conv2d(3, dims[0], 4, 4), FBLayerNorm(dims[0]))
        )
        for i in range(3):
            self.downsample_layers.append(
                nn.Sequential(
                    FBLayerNorm(dims[i]),
                    nn.Conv2d(dims[i], dims[i + 1], 2, 2),
                )
            )
        self.stages = nn.ModuleList(
            nn.Sequential(
                *[FBConvNeXtBlock(dims[i], use_grn) for _ in range(depths[i])]
            )
            for i in range(4)
        )
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head = nn.Linear(dims[-1], num_classes)

    def forward(self, x):
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
        x = self.norm(x.mean([-2, -1]))
        return self.head(x)


# --------------------------------------------------------------------------
# RepVGG (DingXiaoH naming: stageS.I.rbr_{dense,1x1,identity}, linear)
# --------------------------------------------------------------------------


class DXConvBN(nn.Module):
    def __init__(self, inp, oup, k, stride):
        super().__init__()
        self.conv = nn.Conv2d(inp, oup, k, stride, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(oup)

    def forward(self, x):
        return self.bn(self.conv(x))


class DXRepVGGBlock(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.rbr_dense = DXConvBN(inp, oup, 3, stride)
        self.rbr_1x1 = DXConvBN(inp, oup, 1, stride)
        self.rbr_identity = (
            nn.BatchNorm2d(inp) if inp == oup and stride == 1 else None
        )

    def forward(self, x):
        out = self.rbr_dense(x) + self.rbr_1x1(x)
        if self.rbr_identity is not None:
            out = out + self.rbr_identity(x)
        return F.relu(out)


class DXRepVGG(nn.Module):
    def __init__(self, num_blocks=(1, 1, 1, 1), width_a=0.75, width_b=2.5,
                 num_classes=10):
        super().__init__()
        base = [64, 128, 256, 512]
        widths = [
            int(base[0] * min(width_a, 1.0)),
            int(base[1] * width_a),
            int(base[2] * width_a),
            int(base[3] * width_b),
        ]
        self.stage0 = DXRepVGGBlock(3, widths[0], 2)
        inp = widths[0]
        for si, (n, w) in enumerate(zip(num_blocks, widths)):
            blocks = []
            for bi in range(n):
                blocks.append(DXRepVGGBlock(inp, w, 2 if bi == 0 else 1))
                inp = w
            setattr(self, f"stage{si + 1}", nn.Sequential(*blocks))
        self.linear = nn.Linear(widths[3], num_classes)

    def forward(self, x):
        x = self.stage0(x)
        for si in range(1, 5):
            x = getattr(self, f"stage{si}")(x)
        return self.linear(x.mean([2, 3]))


# --------------------------------------------------------------------------
# EfficientNet (torchvision naming: features.S.I.block.J, classifier.1)
# --------------------------------------------------------------------------


class TVConvBNSiLU(nn.Module):
    """Conv2dNormActivation: keys .0 conv / .1 bn."""

    def __init__(self, inp, oup, k, stride, groups=1, act=True, bn_eps=1e-3):
        super().__init__()
        seq = [
            nn.Conv2d(inp, oup, k, stride, (k - 1) // 2, groups=groups,
                      bias=False),
            nn.BatchNorm2d(oup, eps=bn_eps),
        ]
        self.act = act
        self.seq = nn.Sequential(*seq)

    def forward(self, x):
        x = self.seq(x)
        return F.silu(x) if self.act else x

    # emulate Sequential key layout (".0", ".1" directly on this module)
    def _named_members_compat(self):
        pass


class TVSqueezeExcitation(nn.Module):
    def __init__(self, in_ch, squeeze_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, squeeze_ch, 1)
        self.fc2 = nn.Conv2d(squeeze_ch, in_ch, 1)

    def forward(self, x):
        s = x.mean([2, 3], keepdim=True)
        s = self.fc2(F.silu(self.fc1(s)))
        return x * torch.sigmoid(s)


class TVMBConv(nn.Module):
    def __init__(self, inp, oup, k, stride, expand):
        super().__init__()
        hidden = inp * expand
        layers = []
        if expand != 1:
            layers.append(TVConvBNSiLU(inp, hidden, 1, 1))
        layers.append(TVConvBNSiLU(hidden, hidden, k, stride, groups=hidden))
        layers.append(TVSqueezeExcitation(hidden, max(1, inp // 4)))
        layers.append(TVConvBNSiLU(hidden, oup, 1, 1, act=False))
        self.block = nn.Sequential(*layers)
        self.use_res = stride == 1 and inp == oup

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class TVEfficientNetB0(nn.Module):
    """b0 (width/depth mult 1.0) with torchvision feature indexing. BN eps
    1e-3 matches robustart_tpu.models.efficientnet._ConvBNSiLU."""

    BASE = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
            (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
            (6, 320, 1, 1, 3)]

    def __init__(self, num_classes=10):
        super().__init__()
        features = [TVConvBNSiLU(3, 32, 3, 2)]
        inp = 32
        for expand, ch, repeats, stride, k in self.BASE:
            stage = []
            for i in range(repeats):
                stage.append(
                    TVMBConv(inp, ch, k, stride if i == 0 else 1, expand)
                )
                inp = ch
            features.append(nn.Sequential(*stage))
        features.append(TVConvBNSiLU(inp, 1280, 1, 1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(nn.Dropout(0.2),
                                        nn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        return self.classifier(x.mean([2, 3]))


def rename_efficientnet_keys(sd):
    """Map the TVConvBNSiLU '.seq.0/.seq.1' keys to torchvision's '.0/.1'."""
    return {k.replace(".seq.", "."): v for k, v in sd.items()}


# --------------------------------------------------------------------------
# RegNet (pycls naming: stem.{conv,bn}, sS.bB.{proj,bn,f.*}, head.fc)
# --------------------------------------------------------------------------


class PyclsSE(nn.Module):
    def __init__(self, w_in, w_se):
        super().__init__()
        self.f_ex = nn.Sequential(
            nn.Conv2d(w_in, w_se, 1, bias=True),
            nn.ReLU(inplace=True),
            nn.Conv2d(w_se, w_in, 1, bias=True),
            nn.Sigmoid(),
        )

    def forward(self, x):
        return x * self.f_ex(x.mean([2, 3], keepdim=True))


class PyclsBottleneckTransform(nn.Module):
    def __init__(self, w_in, w_out, stride, group_w, se_r):
        super().__init__()
        self.a = nn.Conv2d(w_in, w_out, 1, 1, 0, bias=False)
        self.a_bn = nn.BatchNorm2d(w_out)
        groups = max(1, w_out // group_w)
        self.b = nn.Conv2d(w_out, w_out, 3, stride, 1, groups=groups,
                           bias=False)
        self.b_bn = nn.BatchNorm2d(w_out)
        self.se = (
            PyclsSE(w_out, max(1, int(round(w_in * se_r)))) if se_r else None
        )
        self.c = nn.Conv2d(w_out, w_out, 1, 1, 0, bias=False)
        self.c_bn = nn.BatchNorm2d(w_out)

    def forward(self, x):
        x = F.relu(self.a_bn(self.a(x)))
        x = F.relu(self.b_bn(self.b(x)))
        if self.se is not None:
            x = self.se(x)
        return self.c_bn(self.c(x))


class PyclsResBlock(nn.Module):
    def __init__(self, w_in, w_out, stride, group_w, se_r):
        super().__init__()
        self.has_proj = w_in != w_out or stride != 1
        if self.has_proj:
            self.proj = nn.Conv2d(w_in, w_out, 1, stride, 0, bias=False)
            self.bn = nn.BatchNorm2d(w_out)
        self.f = PyclsBottleneckTransform(w_in, w_out, stride, group_w, se_r)

    def forward(self, x):
        identity = self.bn(self.proj(x)) if self.has_proj else x
        return F.relu(identity + self.f(x))


class PyclsRegNet(nn.Module):
    def __init__(self, widths, depths, group_w, se_r=0.0, num_classes=10):
        super().__init__()

        class Stem(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
                self.bn = nn.BatchNorm2d(32)

            def forward(self, x):
                return F.relu(self.bn(self.conv(x)))

        class Head(nn.Module):
            def __init__(self, w):
                super().__init__()
                self.fc = nn.Linear(w, num_classes)

            def forward(self, x):
                return self.fc(x.mean([2, 3]))

        self.stem = Stem()
        w_in = 32
        self.n_stages = len(widths)
        for si, (w, d) in enumerate(zip(widths, depths)):
            stage = nn.Module()
            for bi in range(d):
                stage.add_module(
                    f"b{bi + 1}",
                    PyclsResBlock(w_in, w, 2 if bi == 0 else 1, group_w, se_r),
                )
                w_in = w
            setattr(self, f"s{si + 1}", stage)
        self.head = Head(w_in)

    def forward(self, x):
        x = self.stem(x)
        for si in range(1, self.n_stages + 1):
            for block in getattr(self, f"s{si}").children():
                x = block(x)
        return self.head(x)


# --------------------------------------------------------------------------
# Swin Transformer (microsoft naming: layers.S.blocks.B.*, downsample.*)
# --------------------------------------------------------------------------


class MSWindowAttention(nn.Module):
    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.dim, self.ws, self.nh = dim, window_size, num_heads
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads)
        )
        coords = torch.stack(
            torch.meshgrid(
                torch.arange(window_size), torch.arange(window_size),
                indexing="ij",
            )
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size - 1
        rel[:, :, 1] += window_size - 1
        rel[:, :, 0] *= 2 * window_size - 1
        self.register_buffer(
            "relative_position_index", rel.sum(-1), persistent=True
        )

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        hd = c // self.nh
        qkv = (
            self.qkv(x).reshape(b_, n, 3, self.nh, hd).permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd**-0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.nh, n, n) + mask.unsqueeze(
                1
            ).unsqueeze(0)
            attn = attn.view(-1, self.nh, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


def ms_window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, c)


def ms_window_reverse(windows, ws, h, w):
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


class MSSwinBlock(nn.Module):
    def __init__(self, dim, resolution, num_heads, window_size=7, shift=0):
        super().__init__()
        self.dim, self.res, self.ws = dim, resolution, window_size
        self.shift = shift if window_size < resolution else 0
        self.norm1 = nn.LayerNorm(dim)
        self.attn = MSWindowAttention(dim, min(window_size, resolution),
                                      num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        if self.shift > 0:
            h = w = resolution
            img_mask = torch.zeros(1, h, w, 1)
            cnt = 0
            ws = self.ws
            for hs in (slice(0, -ws), slice(-ws, -self.shift),
                       slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = ms_window_partition(img_mask, ws).view(-1, ws * ws)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
            self.register_buffer("attn_mask", am, persistent=False)
        else:
            self.attn_mask = None

    def forward(self, x):  # (B, L, C)
        h = w = self.res
        b, L, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        ws = min(self.ws, self.res)
        xw = ms_window_partition(x, ws)
        aw = self.attn(xw, self.attn_mask)
        x = ms_window_reverse(aw, ws, h, w)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(b, L, c)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class MSPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, h, w):  # (B, L, C)
        b, L, c = x.shape
        x = x.view(b, h, w, c)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


class MSSwin(nn.Module):
    """Official microsoft Swin (reduced) — downsample at END of each layer."""

    def __init__(self, img_size=112, embed_dim=24, depths=(2, 2),
                 num_heads=(3, 6), window_size=7, num_classes=10):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(embed_dim)
        res = img_size // 4
        self.layers = nn.ModuleList()
        self.resolutions = []
        for si, (depth, heads) in enumerate(zip(depths, num_heads)):
            dim = embed_dim * (2**si)
            layer = nn.Module()
            layer.blocks = nn.ModuleList(
                MSSwinBlock(
                    dim, res, heads, window_size,
                    shift=0 if di % 2 == 0 else window_size // 2,
                )
                for di in range(depth)
            )
            if si < len(depths) - 1:
                layer.downsample = MSPatchMerging(dim)
            self.resolutions.append(res)
            self.layers.append(layer)
            if si < len(depths) - 1:
                res //= 2
        self.norm = nn.LayerNorm(embed_dim * 2 ** (len(depths) - 1))
        self.head = nn.Linear(embed_dim * 2 ** (len(depths) - 1), num_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        b, c, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for si, layer in enumerate(self.layers):
            res = self.resolutions[si]
            for blk in layer.blocks:
                x = blk(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x, res, res)
        x = self.norm(x)
        return self.head(x.mean(1))


# --------------------------------------------------------------------------
# CLIP visual tower (openai naming: visual.conv1, visual.transformer.*)
# --------------------------------------------------------------------------


class OAIResidualAttentionBlock(nn.Module):
    def __init__(self, d_model, n_head):
        super().__init__()
        self.attn = nn.MultiheadAttention(d_model, n_head, batch_first=True)
        self.ln_1 = nn.LayerNorm(d_model)
        self.mlp = nn.Module()
        self.mlp.c_fc = nn.Linear(d_model, d_model * 4)
        self.mlp.c_proj = nn.Linear(d_model * 4, d_model)
        self.ln_2 = nn.LayerNorm(d_model)

    def forward(self, x):
        y = self.ln_1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        y = self.ln_2(x)
        y = self.mlp.c_fc(y)
        y = y * torch.sigmoid(1.702 * y)  # QuickGELU
        return x + self.mlp.c_proj(y)


class OAIVisionTransformer(nn.Module):
    """OpenAI CLIP visual tower, keys prefixed 'visual.' by the wrapper."""

    def __init__(self, input_resolution=56, patch_size=14, width=64,
                 layers=2, heads=4, output_dim=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width**-0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n = (input_resolution // patch_size) ** 2 + 1
        self.positional_embedding = nn.Parameter(scale * torch.randn(n, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.Sequential(
            *[OAIResidualAttentionBlock(width, heads) for _ in range(layers)]
        )
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype
        )
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = self.transformer.resblocks(x)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj
