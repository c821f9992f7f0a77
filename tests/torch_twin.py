"""Test fixture: a PyTorch twin of the reference DeepSpeech2 architecture.

Used ONLY by tests to generate random reference weights/logits so the flax
model + torch importer can be verified for numerical parity without
downloading the pretrained checkpoints. Mirrors the architecture constants
documented in SURVEY.md §2 (conv stack, summed BiLSTM, seq-wise BN, bias-free
head) via plain torch modules.
"""

import math

import torch
import torch.nn as nn


class _SeqBN(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.module = nn.BatchNorm1d(n)

    def forward(self, x):  # (T, N, H)
        t, n = x.size(0), x.size(1)
        return self.module(x.view(t * n, -1)).view(t, n, -1)


class TorchTwin(nn.Module):
    def __init__(self, num_classes=29, hidden=32, layers=2, bidirectional=True,
                 sample_rate=16000, window_size=0.02, rnn_type=nn.LSTM,
                 lookahead_context=5):
        super().__init__()
        self.bidirectional = bidirectional
        self.conv1 = nn.Conv2d(1, 32, (41, 11), (2, 2), (20, 5))
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 32, (21, 11), (2, 1), (10, 5))
        self.bn2 = nn.BatchNorm2d(32)
        size = int(math.floor(sample_rate * window_size / 2) + 1)
        size = int(math.floor(size + 2 * 20 - 41) / 2 + 1)
        size = int(math.floor(size + 2 * 10 - 21) / 2 + 1)
        self.rnn_input = size * 32
        self.rnns = nn.ModuleList()
        self.rnn_bns = nn.ModuleList()
        for i in range(layers):
            in_sz = self.rnn_input if i == 0 else hidden
            self.rnn_bns.append(_SeqBN(in_sz) if i > 0 else nn.Identity())
            self.rnns.append(rnn_type(in_sz, hidden, bidirectional=bidirectional, bias=True))
        self.lookahead = None
        if not bidirectional:
            pad = lookahead_context - 1
            self.lookahead_pad = pad
            self.lookahead = nn.Conv1d(hidden, hidden, lookahead_context, 1,
                                       groups=hidden, padding=0, bias=False)
        self.fc_bn = nn.BatchNorm1d(hidden)
        self.fc = nn.Linear(hidden, num_classes, bias=False)

    def seq_lens(self, lengths):
        out = lengths
        for k, s in ((11, 2), (11, 1)):
            out = (out + 2 * 5 - (k - 1) - 1) // s + 1
        return out.int()

    def forward(self, x, lengths):  # x: (B, 1, F, T)
        out_lengths = self.seq_lens(lengths)

        def mask(z):
            m = torch.arange(z.size(3))[None, :] < out_lengths[:, None]
            return z * m[:, None, None, :].to(z.dtype)

        x = mask(self.conv1(x))
        x = mask(torch.clamp(self.bn1(x), 0, 20))
        x = mask(self.conv2(x))
        x = mask(torch.clamp(self.bn2(x), 0, 20))

        b = x.size(0)
        x = x.view(b, x.size(1) * x.size(2), x.size(3))  # (B, C*F, T)
        x = x.transpose(1, 2).transpose(0, 1).contiguous()  # (T, B, H)
        t_full = x.size(0)
        for bn, rnn in zip(self.rnn_bns, self.rnns):
            x = bn(x)
            packed = nn.utils.rnn.pack_padded_sequence(x, out_lengths, enforce_sorted=False)
            x, _ = rnn(packed)
            x, _ = nn.utils.rnn.pad_packed_sequence(x, total_length=t_full)
            if self.bidirectional:
                t, n = x.size(0), x.size(1)
                x = x.view(t, n, 2, -1).sum(2)
        if self.lookahead is not None:
            x = x.transpose(0, 1).transpose(1, 2)
            x = nn.functional.pad(x, (0, self.lookahead_pad))
            x = self.lookahead(x)
            x = x.transpose(1, 2).transpose(0, 1).contiguous()
            x = torch.clamp(x, 0, 20)
        t, n = x.size(0), x.size(1)
        x = self.fc(self.fc_bn(x.view(t * n, -1))).view(t, n, -1)
        return x.transpose(0, 1), out_lengths  # (B, T, C) raw logits

    def export_reference_state_dict(self):
        """Rename twin params to the reference's state_dict key layout
        (deepspeech_pytorch/model.py naming) so the importer can be tested."""
        sd = self.state_dict()
        out = {}
        ren = {
            "conv1.": "conv.seq_module.0.", "bn1.": "conv.seq_module.1.",
            "conv2.": "conv.seq_module.3.", "bn2.": "conv.seq_module.4.",
            "fc_bn.": "fc.0.module.0.", "fc.": "fc.0.module.1.",
            "lookahead.": "lookahead.0.conv.",
        }
        for k, v in sd.items():
            if k.startswith("rnns."):
                i = k.split(".")[1]
                rest = k.split(".", 2)[2]
                out[f"rnns.{i}.rnn.{rest}"] = v
            elif k.startswith("rnn_bns."):
                i = k.split(".")[1]
                rest = k.split(".", 2)[2]
                out[f"rnns.{i}.batch_norm.{rest}"] = v
            else:
                for old, new in ren.items():
                    if k.startswith(old):
                        out[new + k[len(old):]] = v
                        break
                else:
                    out[k] = v
        return {k: v for k, v in out.items() if "num_batches_tracked" not in k}
