#!/usr/bin/env python
"""A/B oracle: the DPI loop in plain PyTorch float64 (reference semantics).

Fresh implementation of the reference's algorithm (math per SURVEY.md §3.2,
no code copied) to answer one question: does the torch-f64 reference
algorithm converge on the 100-d Burgers recipe where our loop shows
transient growth? Run: python scripts/ab_torch_dpi.py --nx 100 --iters 12
"""

import argparse
import math
import time

import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=100)
    ap.add_argument("--k", type=float, default=5.0)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--data-size", type=int, default=1024)
    ap.add_argument("--m", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--fixed-weight", type=float, default=0.0)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    torch.set_default_dtype(torch.float32 if args.f32 else torch.float64)
    torch.manual_seed(0)
    nx, T, alpha = args.nx, 1.0, 1.0
    k = args.k / math.sqrt(nx)
    sqrt_a = math.sqrt(alpha)
    c = (2 + k * k * alpha * nx) / (2 * k * alpha * nx)

    def g(x):
        return torch.sigmoid(T + k * x.sum(-1, keepdim=True))

    def exact(t, x):
        return torch.sigmoid(t + k * x.sum(-1, keepdim=True))

    def exact_ux(t, x):
        u = exact(t, x)
        return torch.ones_like(x) * (k * u * (1 - u))

    def ff(t, x, y, w):
        return sqrt_a * (k * y - c) * (sqrt_a * w).sum(-1, keepdim=True)

    def make_net():
        layers = []
        widths = [1 + nx, 128, 128, 128, 128, 1]
        for i in range(4):
            layers += [torch.nn.Linear(widths[i], widths[i + 1]),
                       torch.nn.ELU()]
        layers += [torch.nn.Linear(128, 1)]
        return torch.nn.Sequential(*layers)

    def u_and_grad(net, t, x):
        if net is None:
            return torch.zeros(x.size(0), 1), torch.zeros_like(x)
        x = x.clone().requires_grad_()
        u = net(torch.cat([t, x], dim=-1))
        ux = torch.autograd.grad(u.sum(), x)[0]
        return u.detach(), ux.detach()

    @torch.no_grad()
    def rrmse(net):
        torch.manual_seed(999)
        t = torch.rand(2000, 1) * T
        x = torch.sqrt(t) * sqrt_a * torch.randn(2000, nx)
        u = net(torch.cat([t, x], dim=-1))
        ue = exact(t, x)
        return float(((u - ue) ** 2).sum().sqrt() / (ue ** 2).sum().sqrt())

    def generate(net_prev, n_points, m):
        """value+gradient Picard targets (survey §3.2 formulas)."""
        eps = 0.01
        t = torch.rand(n_points, 1) * (T - 2 * eps) + eps
        x = torch.sqrt(t) * sqrt_a * torch.randn(n_points, nx)
        tx = torch.cat([t, x], dim=-1)
        tr = torch.repeat_interleave(t, m, 0)
        xr = torch.repeat_interleave(x, m, 0)
        # terminal with CV
        dW = torch.randn_like(xr)
        XT = xr + torch.sqrt(T - tr) * sqrt_a * dW
        g0 = g(x)
        gT = g(XT)
        Y = dW / torch.sqrt(T - tr) / sqrt_a
        eY = torch.cat([torch.ones_like(gT), Y], dim=-1)
        term = ((gT - torch.repeat_interleave(g0, m, 0)) * eY)
        term = term.view(n_points, m, -1).mean(1)
        term[:, :1] += g0
        # integral with CV
        s = torch.rand_like(tr) * (T - tr) + tr
        dW2 = torch.randn_like(xr)
        Xs = xr + torch.sqrt(s - tr) * sqrt_a * dW2
        u_s, ux_s = u_and_grad(net_prev, s, Xs)
        f = ff(s, Xs, u_s, ux_s)
        u0, ux0 = u_and_grad(net_prev, t, x)
        f0 = ff(t, x, u0, ux0)
        f0r = torch.repeat_interleave(f0, m, 0)
        Ys = dW2 / torch.sqrt(s - tr) / sqrt_a
        eYs = torch.cat([torch.ones_like(s), Ys], dim=-1)
        integ = ((T - tr) * (f - f0r) * eYs).view(n_points, m, -1).mean(1)
        integ[:, :1] += f0 * (T - t)
        return tx, term + integ

    net_prev = None
    net = make_net()
    for it in range(1, args.iters + 1):
        t0 = time.time()
        tx, y = generate(net_prev, args.data_size, args.m)
        if net_prev is not None:  # RELOAD warm start
            pass  # net already carries previous weights
        opt = torch.optim.Adam(net.parameters(), lr=1e-3)
        n = tx.size(0)
        for ep in range(args.epochs):
            perm = torch.randperm(n)
            for i0 in range(0, n - args.bs + 1, args.bs):
                idx = perm[i0:i0 + args.bs]
                txb, yb = tx[idx], y[idx]
                if args.fixed_weight > 0:
                    xb = txb[:, 1:].clone().requires_grad_()
                    ub = net(torch.cat([txb[:, :1], xb], dim=-1))
                    uxb = torch.autograd.grad(ub.sum(), xb,
                                              create_graph=True)[0]
                    v_loss = ((ub - yb[:, :1]) ** 2).mean()
                    g_loss = ((uxb - yb[:, 1:]) ** 2).mean(0).sum()
                    loss = v_loss + args.fixed_weight * g_loss
                else:
                    ub = net(txb)
                    loss = ((ub - yb[:, :1]) ** 2).mean()
                opt.zero_grad()
                loss.backward()
                opt.step()
        import copy

        net_prev = copy.deepcopy(net)
        for p in net_prev.parameters():
            p.requires_grad_(False)
        print(f"iter {it}: rRMSE {rrmse(net):.4f}  "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
