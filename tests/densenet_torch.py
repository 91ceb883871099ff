"""Minimal torch DenseNet-121 features stand-in with torchvision-faithful
module naming (torchvision is not installed here). Only what FPNDense taps:
conv0/norm0/relu0/pool0, denseblock1..4, transition1..3, norm5."""

from collections import OrderedDict

import torch
import torch.nn as nn


class _DenseLayer(nn.Module):
    def __init__(self, in_ch, growth=32, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=False)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=False)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

    def forward(self, x):
        h = self.conv1(self.relu1(self.norm1(x)))
        h = self.conv2(self.relu2(self.norm2(h)))
        return torch.cat([x, h], 1)


class _DenseBlock(nn.Module):
    def __init__(self, n_layers, in_ch, growth=32):
        super().__init__()
        for i in range(n_layers):
            self.add_module(
                f"denselayer{i + 1}", _DenseLayer(in_ch + i * growth, growth)
            )

    def forward(self, x):
        for m in self.children():
            x = m(x)
        return x


class _Transition(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__(
            OrderedDict(
                [
                    ("norm", nn.BatchNorm2d(in_ch)),
                    ("relu", nn.ReLU(inplace=False)),
                    ("conv", nn.Conv2d(in_ch, out_ch, 1, bias=False)),
                    ("pool", nn.AvgPool2d(2, 2)),
                ]
            )
        )


class _Features(nn.Module):
    def __init__(self, block_config=(6, 12, 24, 16), growth=32):
        super().__init__()
        self.conv0 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.norm0 = nn.BatchNorm2d(64)
        self.relu0 = nn.ReLU(inplace=False)
        self.pool0 = nn.MaxPool2d(3, stride=2, padding=1)
        feats = 64
        for bi, n in enumerate(block_config, start=1):
            self.add_module(f"denseblock{bi}", _DenseBlock(n, feats, growth))
            feats += n * growth
            if bi != len(block_config):
                self.add_module(f"transition{bi}", _Transition(feats, feats // 2))
                feats //= 2
        self.norm5 = nn.BatchNorm2d(feats)


class _DenseNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _Features()


def densenet121(pretrained=False):
    return _DenseNet()
