"""Measure the PyTorch-CPU baseline: stays/sec for the full trimodal
10-route capsule workload (fwd+bwd), equivalent in architecture and size to
the reference flagship (MIMIC-IV/MortModel/Paired_Cross_Attention).

The reference publishes no numbers (SURVEY.md §6), so this script establishes
the baseline the TPU build is compared against (BASELINE.json north star:
">=5x PyTorch-CPU stays/sec/chip"). The model here is an independent torch
implementation of the same computation: BEHRT transformer encoder (2L, d=256),
BERT-base note encoder over [B*S,512] chunks, ResNet34-shape CNN, 9
directional MulT streams (4L cross / 2L self), capsule routing (R=10, K=2,
pc=32, mc=64, 3 iters).

Writes bench_baseline.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import time

import torch
import torch.nn as nn


class TorchBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


def resnet34_torch():
    stages = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
    layers = [
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2, 1),
    ]
    cin = 64
    for cout, n, stride in stages:
        for i in range(n):
            layers.append(TorchBasicBlock(cin, cout, stride if i == 0 else 1))
            cin = cout
    return nn.Sequential(*layers)


class TorchFlagship(nn.Module):
    def __init__(self, d=256, n_feats=76, bert_hidden=768, bert_layers=12, s_chunks=8):
        super().__init__()
        self.d = d
        # BEHRT
        self.l_proj = nn.Linear(n_feats, d)
        enc_layer = nn.TransformerEncoderLayer(d, 8, 4 * d, dropout=0.0, batch_first=True)
        self.behrt = nn.TransformerEncoder(enc_layer, 2)
        # BERT-base equivalent note encoder
        self.tok_emb = nn.Embedding(28996, bert_hidden)
        self.pos_emb = nn.Embedding(512, bert_hidden)
        bl = nn.TransformerEncoderLayer(
            bert_hidden, 12, 3072, dropout=0.0, activation="gelu", batch_first=True
        )
        self.bert = nn.TransformerEncoder(bl, bert_layers)
        self.n_proj = nn.Linear(bert_hidden, d, bias=False)
        # image
        self.cnn = resnet34_torch()
        self.i_proj = nn.Linear(512, d)
        self.tok_proj = nn.Linear(512, d, bias=False)
        # MulT streams: 3 self (2L) + 6 cross (4L)
        mk = lambda n: nn.TransformerEncoder(  # noqa: E731
            nn.TransformerEncoderLayer(d, 8, 4 * d, dropout=0.0, batch_first=True), n
        )
        self.self_streams = nn.ModuleList([mk(2) for _ in range(3)])
        self.cross_q = nn.ModuleList([nn.MultiheadAttention(d, 8, batch_first=True) for _ in range(6 * 4)])
        self.cross_ff = nn.ModuleList(
            [nn.Sequential(nn.Linear(d, 4 * d), nn.ReLU(), nn.Linear(4 * d, d)) for _ in range(6 * 4)]
        )
        self.pair = nn.ModuleList([nn.Linear(2 * d, d) for _ in range(3)])
        self.final_lni = nn.Linear(3 * d, d)
        # capsule
        self.projector = nn.ModuleList([nn.Linear(d, 33) for _ in range(10)])
        self.w = nn.Parameter(torch.randn(10, 32, 2, 64) * (2.0 / (32 * 10)) ** 0.5)
        self.pose_to_mc = nn.Linear(32, 64, bias=False)
        self.embedding = nn.Parameter(torch.zeros(2, 64))
        self.bias = nn.Parameter(torch.zeros(2))

    def forward(self, x_struct, note_ids, image):
        b, s, l = note_ids.shape
        hl = self.behrt(self.l_proj(x_struct))  # [B,T,d]
        ids = note_ids.reshape(b * s, l)
        pos = torch.arange(l, device=ids.device)
        hn = self.bert(self.tok_emb(ids) + self.pos_emb(pos))
        hn = self.n_proj(hn[:, 0]).reshape(b, s, self.d)
        fmap = self.cnn(image)  # [B,512,7,7]
        hi = self.tok_proj(fmap.flatten(2).transpose(1, 2))
        seqs = [hl, hn, hi]
        t_max = max(x.shape[1] for x in seqs)
        seqs = [nn.functional.pad(x, (0, 0, 0, t_max - x.shape[1])) for x in seqs]
        zs = [self.self_streams[i](seqs[i]).mean(1) for i in range(3)]
        pairs = [(0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1)]
        pooled = []
        for gi, (q, kv) in enumerate(pairs):
            h = seqs[q]
            for li in range(4):
                idx = gi * 4 + li
                att, _ = self.cross_q[idx](h, seqs[kv], seqs[kv])
                h = h + att
                h = h + self.cross_ff[idx](h)
            pooled.append(h.mean(1))
        e_ln = self.pair[0](torch.cat([pooled[0], pooled[2]], -1))
        e_li = self.pair[1](torch.cat([pooled[1], pooled[4]], -1))
        e_ni = self.pair[2](torch.cat([pooled[3], pooled[5]], -1))
        z_lni = self.final_lni(torch.cat([e_ln, e_li, e_ni], -1))
        routes = zs + pooled + [z_lni]  # 10
        pc = torch.stack([self.projector[i](routes[i]) for i in range(10)], 1)
        poses, acts = pc[:, :, :32], torch.sigmoid(pc[:, :, 32:])
        # capsule routing 3 iters
        seed = torch.full((10, 2), 0.5, device=poses.device)
        next_pose = torch.einsum("nm,bna,namd->bmd", seed, poses, self.w)
        next_act = acts.mean(1).expand(b, 2)
        ones = torch.ones(b, 10, device=poses.device)
        for _ in range(3):
            agree = torch.einsum("bna,namd,bmd->bnm", poses, self.w, next_pose) / 8.0
            qk = torch.softmax(agree, 2) * next_act.unsqueeze(1)
            coef = qk / (qk.sum(2, keepdim=True) + 1e-10)
            next_pose = torch.einsum("bnm,bna,namd,bn->bmd", coef, poses, self.w, ones)
            next_act = torch.ones(b, 2, device=poses.device)
        r = coef / coef.sum(1, keepdim=True).clamp_min(1e-10)
        d_bkp = torch.einsum("brk,brp->bkp", r, poses)
        logits = torch.einsum("bkm,km->bk", self.pose_to_mc(d_bkp), self.embedding) + self.bias
        return logits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--out", default="bench_baseline.json")
    args = ap.parse_args()

    torch.manual_seed(0)
    model = TorchFlagship(s_chunks=args.chunks)
    opt = torch.optim.AdamW(model.parameters(), lr=2e-4)
    b = args.batch
    x_struct = torch.randn(b, 48, 76)
    note_ids = torch.randint(0, 28996, (b, args.chunks, 512))
    image = torch.randn(b, 3, args.image, args.image)
    y = torch.randint(0, 2, (b,)).float()

    def step():
        opt.zero_grad()
        logits = model(x_struct, note_ids, image)
        loss = nn.functional.binary_cross_entropy_with_logits(logits[:, 1] - logits[:, 0], y)
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    stays_per_sec = b * args.steps / dt
    result = {
        "torch_cpu_stays_per_sec": stays_per_sec,
        "batch": b,
        "chunks": args.chunks,
        "steps": args.steps,
        "sec_per_step": dt / args.steps,
        "torch_version": torch.__version__,
        "threads": torch.get_num_threads(),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
