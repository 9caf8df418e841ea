"""Torch-CPU baseline for the bench: fab-torch's hot path, minimally reproduced.

The reference (lollcat/fab-torch) cannot run in this image (normflows/nflows are not
installed), so the CPU baseline is this minimal torch implementation of the SAME
computational pattern and configuration as the reference's flagship ManyWell-32
FAB+buffer iteration (experiments/config/many_well.yaml + SURVEY §3.1/3.2):

  flow sample -> per-point autograd grads of log q and log p -> AIS chain of
  n_int=4 HMC transitions (L=5 leapfrog steps, each re-evaluating flow+target
  log-probs with x-gradients) -> 8 prioritised-replay gradient steps (flow log_prob,
  w_adjust, adam step).

RealNVP with the paper architecture (10 layers x 10 nodes/dim conditioners,
invertible linear mixing). This intentionally mirrors the torch execution model
(eager ops, autograd per step) — that IS the baseline being compared against.

Writes {"samples_per_s": ...} JSON to stdout.
"""
from __future__ import annotations

import json
import math
import time

import torch
import torch.nn as nn

torch.set_grad_enabled(True)


class Coupling(nn.Module):
    def __init__(self, dim, width):
        super().__init__()
        d = (dim + 1) // 2
        self.d = d
        self.net = nn.Sequential(
            nn.Linear(d, width), nn.ReLU(), nn.Linear(width, width), nn.ReLU(),
            nn.Linear(width, 2 * (dim - d)),
        )
        nn.init.zeros_(self.net[-1].weight)
        nn.init.zeros_(self.net[-1].bias)

    def forward(self, z):
        z1, z2 = z[:, : self.d], z[:, self.d:]
        h = self.net(z1)
        shift, log_scale = h.chunk(2, dim=-1)
        y2 = z2 * torch.exp(log_scale) + shift
        return torch.cat([z1, y2], -1), log_scale.sum(-1)

    def inverse(self, x):
        x1, x2 = x[:, : self.d], x[:, self.d:]
        h = self.net(x1)
        shift, log_scale = h.chunk(2, dim=-1)
        z2 = (x2 - shift) * torch.exp(-log_scale)
        return torch.cat([x1, z2], -1), -log_scale.sum(-1)


class InvLinear(nn.Module):
    def __init__(self, dim):
        super().__init__()
        w, _ = torch.linalg.qr(torch.randn(dim, dim))
        self.weight = nn.Parameter(w)

    def forward(self, z):
        y = z @ self.weight.T
        ld = torch.slogdet(self.weight)[1]
        return y, ld.expand(z.shape[0])

    def inverse(self, x):
        z = torch.linalg.solve(self.weight, x.T).T
        ld = -torch.slogdet(self.weight)[1]
        return z, ld.expand(x.shape[0])


class Flow(nn.Module):
    def __init__(self, dim, n_layers, nodes_per_dim):
        super().__init__()
        self.dim = dim
        layers = []
        for _ in range(n_layers):
            layers += [Coupling(dim, dim * nodes_per_dim), InvLinear(dim)]
        self.layers = nn.ModuleList(layers)

    def sample_and_log_prob(self, n):
        z = torch.randn(n, self.dim)
        log_q = -0.5 * (z**2).sum(-1) - 0.5 * self.dim * math.log(2 * math.pi)
        for layer in self.layers:
            z, ld = layer(z)
            log_q = log_q - ld
        return z, log_q

    def log_prob(self, x):
        log_det = torch.zeros(x.shape[0])
        for layer in reversed(self.layers):
            x, ld = layer.inverse(x)
            log_det = log_det + ld
        return -0.5 * (x**2).sum(-1) - 0.5 * self.dim * math.log(2 * math.pi) + log_det


def many_well_log_prob(x):
    a, b, c = -0.5, -6.0, 1.0
    x1 = x[:, 0::2]
    x2 = x[:, 1::2]
    return -(a * x1 + b * x1**2 + c * x1**4 + 0.5 * x2**2).sum(-1)


def grad_and_value(fn, x):
    x = x.detach().requires_grad_(True)
    y = fn(x)
    (g,) = torch.autograd.grad(y.sum(), x)
    return g.detach(), y.detach()


def run_baseline(
    dim=32, batch_size=2048, n_int=4, L=5, n_layers=10, nodes_per_dim=10,
    n_replay=8, n_iters=3, max_seconds=600.0,
):
    torch.manual_seed(0)
    flow = Flow(dim, n_layers, nodes_per_dim)
    opt = torch.optim.Adam(flow.parameters(), lr=3e-4)
    betas = torch.linspace(0, 1, n_int + 2)
    eps = 0.1
    alpha = 2.0

    def inter_log_prob(log_q, log_p, beta):
        return ((1 - beta) + beta * (1 - alpha)) * log_q + beta * alpha * log_p

    def grad_inter(x, beta):
        gq, lq = grad_and_value(flow.log_prob, x)
        gp, lp = grad_and_value(many_well_log_prob, x)
        g = ((1 - beta) + beta * (1 - alpha)) * gq + beta * alpha * gp
        return g.clamp(-1e3, 1e3).nan_to_num(0.0), lq, lp

    t0 = time.time()
    done = 0
    for it in range(n_iters):
        with torch.no_grad():
            x, log_q = flow.sample_and_log_prob(batch_size)
        log_p = many_well_log_prob(x)
        log_w = inter_log_prob(log_q, log_p, betas[1]) - log_q
        for j in range(1, n_int + 1):
            # one HMC transition: L leapfrog steps, each with flow+target grads
            p = torch.randn_like(x)
            g, lq, lp = grad_inter(x, betas[j])
            for _ in range(L):
                p = p + eps * g / 2
                x = x + eps * p
                g, lq, lp = grad_inter(x, betas[j])
                p = p + eps * g / 2
            log_w = log_w + (
                inter_log_prob(lq, lp, betas[j + 1])
                - inter_log_prob(lq, lp, betas[j])
            )
        # replay gradient steps
        for _ in range(n_replay):
            opt.zero_grad()
            log_q_x = flow.log_prob(x.detach())
            w_adj = torch.exp((1 - alpha) * (log_q_x.detach() - log_q)).clamp(max=10.0)
            loss = -(w_adj * log_q_x).mean()
            loss.backward()
            opt.step()
        done += 1
        if time.time() - t0 > max_seconds:
            break
    elapsed = time.time() - t0
    return batch_size * done / elapsed


if __name__ == "__main__":
    sps = run_baseline()
    print(json.dumps({"samples_per_s": sps}))
