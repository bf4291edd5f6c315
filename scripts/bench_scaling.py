#!/usr/bin/env python
"""Multi-device scaling-efficiency harness (BASELINE.md north star:
>=80% linear scaling at 16 chips).

Measures the two production hot paths over meshes of 1..N devices:

  - generation: value+gradient MC target generation (the flagship
    workload, Burgers 100-d shapes by default), batch sharded over the
    mesh 'data' axis, WEAK scaling (B = b_per_device * n) so per-device
    work is constant and efficiency = throughput_n / (n * throughput_1).
  - train: the dp supervised train step (grads psum over the mesh).

Runnable today on the 8-virtual-device CPU mesh (structure check:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_scaling.py --nx 8 --b-per-device 64 --m 64 --cpu)
and unchanged the moment real multi-chip hardware appears (it enumerates
jax.devices()). Multi-host: run under distributed.initialize first.

Timing: salt-token chaining (CLAUDE.md) — the completion token is reduced
over the FULL output INSIDE the jit, chained through calls, and forced by
one final host readback; block_until_ready is not a reliable barrier
through the remote-TPU tunnel.

Prints one JSON line per mesh size plus an efficiency table.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=100)
    p.add_argument("--b-per-device", type=int, default=4096)
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=512,
                   help="train-step batch per device")
    p.add_argument("--devices", type=str, default=None,
                   help="comma list of mesh sizes (default: 1,2,4,...,N)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (virtual-device runs)")
    p.add_argument("--pallas", type=str, default="auto",
                   choices=("auto", "true", "false"),
                   help="GenConfig.pallas_generate for the generation jit")
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.config.update("jax_default_matmul_precision", "highest")

    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops import estimators as est
    from deeppicarditeration_tpu.training.trainer import (
        TrainSpec,
        TrainState,
        compute_loss,
    )

    all_devices = jax.devices()
    n_max = len(all_devices)
    if args.devices:
        sizes = [int(s) for s in args.devices.split(",")]
    else:
        sizes, n = [], 1
        while n <= n_max:
            sizes.append(n)
            n *= 2
        if sizes[-1] != n_max:
            sizes.append(n_max)
    sizes = [s for s in sizes if s <= n_max]

    nx, m = args.nx, args.m
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=(128, 128, 128, 128), activations=("ELU",) * 4,
                 out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    spec = TrainSpec(net_type="Value", nx=nx, supervise_gradient=True,
                     scaler_cls="FixedLossScaler",
                     scaler_kwargs=(("fixed_weight", 1.0),))
    tx_opt = optax.adam(1e-3)
    pallas_mode = {"auto": "auto", "true": True, "false": False}[args.pallas]

    rows = []
    for n in sizes:
        mesh = Mesh(np.asarray(all_devices[:n]), ("data",))
        data_shd = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        b = args.b_per_device * n
        gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                            t_always_uniform=True, t_uniform_eps=0.01,
                            chunk_elems=2 ** 25, pallas_generate=pallas_mode,
                            mesh=mesh)
        sol = Solution.from_net(module, jax.device_put(params, repl),
                                "Value", nx)

        # --- generation throughput (weak scaling over 'data') -------------
        @jax.jit
        def generate(key, e, s, salt):
            tx = est.sample_tx(key, e, b, gen)
            tx = jax.lax.with_sharding_constraint(tx, data_shd)
            out = est.generate_with_gradients(key, e, s, tx, gen)
            return jnp.sum(out) * 1e-9 + salt

        key = jax.random.PRNGKey(1)
        salt = generate(key, eq, sol, jnp.zeros(()))
        float(salt)  # compile + warmup
        t0 = time.perf_counter()
        for r in range(args.repeats):
            salt = generate(jax.random.fold_in(key, r), eq, sol, salt)
        float(salt)
        gen_dt = (time.perf_counter() - t0) / args.repeats
        gen_sps = b * 2 * m / gen_dt

        # --- dp train-step throughput --------------------------------------
        bs = args.batch_size * n
        tx_b = jax.device_put(
            jax.random.uniform(key, (bs, 1 + nx)), data_shd)
        y_b = jax.device_put(
            jax.random.uniform(jax.random.fold_in(key, 7), (bs, 1 + nx)),
            data_shd)
        state = jax.device_put(TrainState.create(params, tx_opt), repl)

        @jax.jit
        def train_step(st, tx_in, y_in, salt):
            (loss, _), grads = jax.value_and_grad(
                lambda p: compute_loss(module, p, tx_in, y_in, spec),
                has_aux=True)(st.params)
            updates, opt_state = tx_opt.update(grads, st.opt_state,
                                               st.params)
            st2 = TrainState(params=optax.apply_updates(st.params, updates),
                             opt_state=opt_state, step=st.step + 1)
            return st2, loss * 1e-9 + salt

        salt = jnp.zeros(())
        state, salt = train_step(state, tx_b, y_b, salt)
        float(salt)
        t0 = time.perf_counter()
        steps = max(args.repeats * 4, 8)
        for _ in range(steps):
            state, salt = train_step(state, tx_b, y_b, salt)
        float(salt)
        train_dt = (time.perf_counter() - t0) / steps
        train_pps = bs / train_dt

        rows.append(dict(n_devices=n, batch=b,
                         gen_s_per_call=round(gen_dt, 4),
                         gen_samples_per_s=round(gen_sps, 1),
                         train_points_per_s=round(train_pps, 1)))
        print(json.dumps(rows[-1]))

    base = rows[0]
    print("\n n | gen samples/s | eff | train points/s | eff")
    for r in rows:
        ge = r["gen_samples_per_s"] / (r["n_devices"]
                                       * base["gen_samples_per_s"])
        te = r["train_points_per_s"] / (r["n_devices"]
                                        * base["train_points_per_s"])
        print(f"{r['n_devices']:3d} | {r['gen_samples_per_s']:13.3e} | "
              f"{ge:4.0%} | {r['train_points_per_s']:14.3e} | {te:4.0%}")


if __name__ == "__main__":
    main()
