"""Derivative operators on frozen solutions + the nonlinearity evaluator.

Reference parity:
  - get_f (data.py:1226-1325): evaluate f at sample points given the
    previous-iterate network, routing on network output dim and equation
    flags (full Hessian / SDGD sampled diagonal / Hutchinson Laplacian /
    plain ff/f);
  - hutchinson_trace_estimation_batch (utils.py:499-561);
  - SDGD index sampling (data.py:497-502).

All operators work on arbitrary leading batch dims and compile to batched
XLA ops (vmap of forward-over-reverse), with no Python loops over the
dimension at runtime.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.models.solution import Solution


def _value_fn(sol: Solution):
    """(t_scalar_batch, x) -> u with matching leading dims."""

    def u_fn(t, x):
        tx = jnp.concatenate([jnp.broadcast_to(t, x[..., :1].shape), x],
                             axis=-1)
        return sol.value(tx)

    return u_fn


def grad_x_fn(sol: Solution):
    """Batched du/dx of the value head: one reverse pass, per-sample exact."""

    def g(t, x):
        return sol.value_and_grad_x(t, x)[1]

    return g


def _elementwise_d12(act, z):
    """(act'(z), act''(z)) for an elementwise activation, via nested jvp
    with a ones tangent (exact; no per-activation closed forms needed)."""

    def d1(y):
        return jax.jvp(act, (y,), (jnp.ones_like(y),))[1]

    return jax.jvp(d1, (z,), (jnp.ones_like(z),))


def _store_cast(store):
    """(cast, preferred_element_type) for the second-order chain's
    (R, w, w) intermediates. ``store == "bf16"`` halves HBM traffic on
    the BANDWIDTH-bound FN/SDGD generation path (~8 FLOP/byte measured;
    CLAUDE.md): the G blocks are written and re-read in bf16 and the MXU
    consumes bf16 operands natively with f32 accumulation
    (preferred_element_type). ``None`` is bit-identical to the original
    f32 chain."""
    if store == "bf16":
        return (lambda a: a.astype(jnp.bfloat16)), jnp.float32
    return (lambda a: a), None


def _gz_boundary(s1, G):
    """G_{z_0} = s1 G_{a_0} s1^T: the shared first-layer-boundary assembly
    used by BOTH mlp_hessian_diag and full_hessian (the diag(curv) term is
    contracted separately by each so the single-hidden-layer case never
    materializes an (R, w, w) block)."""
    return s1[:, :, None] * G * s1[:, None, :]


def mlp_hessian_diag(sol: Solution, t, x, store=None) -> jnp.ndarray:
    """Exact FULL Hessian diagonal d^2 u / dx_i^2 of a plain-MLP value
    head, (..., nx), via second-order backprop.

    Propagates the per-sample preactivation Hessian G_k = d^2u/dz_k^2
    down the layers (Pearlmutter-style):

        G_{z_k} = s1_k G_{a_k} s1_k^T + diag(s2_k * delta_{a_k})
        G_{a_{k-1}} = W_k G_{z_k} W_k^T,   delta_{a_{k-1}} = W_k delta_{z_k}

    then diag(H_xx) = rowsum((W1x @ G_{z_1}) * W1x) with W1x the x-rows
    of the first kernel. Same math as v=nx forward-over-reverse jvps but
    ~10x less HBM traffic: intermediates are (R, w, w) G blocks contracted
    on the MXU instead of (R, v, w) tangent chains through both the
    forward and reverse graphs of the net. This is what makes the
    SDGD/fully-nonlinear generation path (v ~ nx, data.py:1280-1292)
    bandwidth-viable on TPU; the per-index jvp fallback below remains for
    small v and non-MLP modules.
    """
    W1x, s1, curv, G = _mlp_second_order(sol, t, x, store=store)
    cast, pet = _store_cast(store)
    if G is None:  # single hidden layer
        diag = jnp.einsum("io,ro->ri", W1x ** 2, curv)
    else:
        Gz = cast(_gz_boundary(s1, G))
        diag = (jnp.einsum("io,rol,il->ri", cast(W1x), Gz, cast(W1x),
                           optimize="greedy", preferred_element_type=pet)
                + jnp.einsum("io,ro->ri", W1x ** 2, curv))
    return diag.astype(x.dtype).reshape(x.shape[:-1] + (x.shape[-1],))


def _mlp_second_order(sol: Solution, t, x, store=None):
    """Shared second-order-backprop chain for a plain-MLP value head.

    Returns (W1x, s1_0, curv_0, G_{a_0}) at the first-hidden-layer
    boundary, from which diag(H) / full H are cheap contractions:
    G_{z_0} = s1_0 G_{a_0} s1_0^T + diag(curv_0), H = W1x G_{z_0} W1x^T.
    G_{a_0} is None when the net has a single hidden layer (exactly 0).

    ``store == "bf16"`` keeps every (R, w, w) G block in bf16 (see
    _store_cast): the chain is HBM-bandwidth-bound and these blocks are
    ~w/2 of its bytes; the (R, w) vectors (delta, s1, curv) stay f32 —
    they are w-times smaller and feed the first-order accuracy.
    """
    from deeppicarditeration_tpu.models.networks import MLP, get_activation

    module: MLP = sol.module
    params = sol.params["params"]
    kernels = [params[f"Dense_{i}"]["kernel"]
               for i in range(len(module.neurons) + 1)]
    biases = [params[f"Dense_{i}"]["bias"]
              for i in range(len(module.neurons) + 1)]
    nx = x.shape[-1]
    xf = x.reshape(-1, nx)
    tf = jnp.broadcast_to(t, x.shape[:-1] + (1,)).reshape(-1, 1)
    h = jnp.concatenate([tf, xf], axis=-1)

    # forward pass, stashing preactivations
    zs = []
    for W, b, act in zip(kernels[:-1], biases[:-1], module.activations):
        z = h @ W + b
        zs.append(z)
        h = get_activation(act)(z)
    y = h @ kernels[-1] + biases[-1]

    # value-head backward seed; an active bound clamp gates it (clip has
    # zero curvature and indicator slope)
    wv = kernels[-1][:, 0]  # (w_L,)
    delta = jnp.broadcast_to(wv, h.shape)
    if module.bound is not None:
        ind = (jnp.abs(y[..., 0:1]) < module.bound).astype(x.dtype)
        delta = delta * ind

    cast, pet = _store_cast(store)
    G = None  # d^2u/da_k^2 at the top is exactly zero (linear head)
    for W, z, act in zip(kernels[-2:0:-1], zs[::-1][:-1],
                         module.activations[::-1][:-1]):
        # layers L-1 .. 2: gather G_z, push through the affine layer
        s1, s2 = _elementwise_d12(get_activation(act), z)
        curv = s2 * delta
        # the diag(curv) term is contracted directly (never materialized)
        Ga = jnp.einsum("io,ro,jo->rij", W, curv, W, optimize="greedy")
        if G is not None:
            Gz = cast(s1[:, :, None] * G * s1[:, None, :])
            Ga = Ga + jnp.einsum("io,rol,jl->rij", cast(W), Gz, cast(W),
                                 optimize="greedy",
                                 preferred_element_type=pet)
        delta = (s1 * delta) @ W.T
        G = cast(Ga)

    act0 = get_activation(module.activations[0])
    s1, s2 = _elementwise_d12(act0, zs[0])
    curv = s2 * delta
    W1x = kernels[0][1:, :]  # drop the t row
    return W1x, s1, curv, G


def _mlp_fast_path(sol: Solution) -> bool:
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import ONLY_GRADIENT

    # OnlyGradient nets have an identically-zero VALUE head (the generic
    # path returns zeros through sol.value); the fast path would wrongly
    # differentiate output column 0 of the gradient net.
    return (sol.kind == "net" and isinstance(sol.module, MLP)
            and sol.net_type != ONLY_GRADIENT
            and len(sol.module.neurons) >= 1)


def sdgd_index_counts(indices, nx: int):
    """Multiplicity counts of sampled SDGD indices: (..., v) -> (..., nx).

    c[..., i] = #{k : indices[..., k] == i}. Lowered as a fused
    broadcast-compare + reduce (no (..., v, nx) materialization, no
    gather) — measured 0.057 s/chunk for the take_along_axis row-gather
    it replaces at FN-100d chunk scale vs ~1 ms for the compare-reduce.
    Statistics that are symmetric in the sampled entries follow as
    count-weighted contractions with the full diagonal:
    sum_sampled phi(d) = c . phi(d).
    """
    iota = jnp.arange(nx, dtype=indices.dtype)
    return jnp.sum(
        (indices[..., :, None] == iota).astype(jnp.float32), axis=-2)


def diag_hessian_entries(sol: Solution, t, x, indices,
                         store=None) -> jnp.ndarray:
    """Sampled diagonal Hessian entries d^2 u / dx_i^2 of the value head.

    t: (..., 1), x: (..., nx), indices: (..., v) int32 -> (..., v).

    Plain-MLP solutions with wide index sets take the second-order-
    backprop full diagonal (mlp_hessian_diag) and gather the sampled
    indices — identical estimator distribution, far less HBM traffic.
    Otherwise: forward-over-reverse per sampled index i (jvp of the
    per-sample gradient along e_i, reading component i), replacing the
    reference's Python loop over v (data.py:1280-1292).
    """
    if sol.kind == "zero":
        return jnp.zeros(indices.shape, x.dtype)
    nx = x.shape[-1]
    v = indices.shape[-1]
    if _mlp_fast_path(sol) and 4 * v >= min(sol.module.neurons):
        diag = mlp_hessian_diag(sol, t, x, store=store)
        return jnp.take_along_axis(diag, indices, axis=-1)
    u_fn = _value_fn(sol)

    def per_sample(t1, x1, idx1):
        def u_scalar(xx):
            return u_fn(t1[None, :], xx[None, :])[0, 0]

        grad_fn = jax.grad(u_scalar)

        def entry(i):
            e = jax.nn.one_hot(i, nx, dtype=x1.dtype)
            _, hcol = jax.jvp(grad_fn, (x1,), (e,))
            return jnp.take(hcol, i)

        return jax.vmap(entry)(idx1)

    flat = jax.vmap(per_sample)(t.reshape(-1, 1), x.reshape(-1, nx),
                                indices.reshape(-1, indices.shape[-1]))
    return flat.reshape(indices.shape)


def full_hessian(sol: Solution, t, x, store=None) -> jnp.ndarray:
    """Per-sample (nx, nx) Hessian of the value head: (..., nx, nx).

    Plain-MLP solutions use the shared second-order-backprop chain
    (H = W1x G_{z_0} W1x^T — two batched MXU contractions per sample
    instead of nx reverse-over-forward passes); others fall back to
    vmap(jax.hessian). ``store``: see _mlp_second_order."""
    nx = x.shape[-1]
    if sol.kind == "zero":
        return jnp.zeros(x.shape[:-1] + (nx, nx), x.dtype)
    if _mlp_fast_path(sol):
        W1x, s1, curv, G = _mlp_second_order(sol, t, x, store=store)
        cast, pet = _store_cast(store)
        H = jnp.einsum("io,ro,jo->rij", W1x, curv, W1x, optimize="greedy")
        if G is not None:
            Gz = cast(_gz_boundary(s1, G))
            H = H + jnp.einsum("io,rol,jl->rij", cast(W1x), Gz, cast(W1x),
                               optimize="greedy",
                               preferred_element_type=pet)
        return H.astype(x.dtype).reshape(x.shape[:-1] + (nx, nx))
    u_fn = _value_fn(sol)

    def per_sample(t1, x1):
        def u_scalar(xx):
            return u_fn(t1[None, :], xx[None, :])[0, 0]

        return jax.hessian(u_scalar)(x1)

    flat = jax.vmap(per_sample)(t.reshape(-1, 1), x.reshape(-1, nx))
    return flat.reshape(x.shape[:-1] + (nx, nx))


def hutchinson_laplacian(key, sol: Solution, t, x, num_v: int) -> jnp.ndarray:
    """Rademacher estimate of Tr Hess u at each point: (..., 1).

    Reference parity: utils.py:499-561. Each probe is one
    forward-over-reverse pass of the whole batch (jvp of the batched
    gradient), so total cost ~ 2 * num_v net evaluations.
    """
    if sol.kind == "zero":
        return jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    g = grad_x_fn(sol)

    def probe(k):
        z = (jax.random.rademacher(k, x.shape, dtype=jnp.int32)
             .astype(x.dtype))
        _, hz = jax.jvp(lambda xx: g(t, xx), (x,), (z,))
        return jnp.sum(hz * z, axis=-1, keepdims=True)

    probes = jax.vmap(probe)(jax.random.split(key, num_v))
    return jnp.mean(probes, axis=0)


def exact_laplacian(sol: Solution, t, x) -> jnp.ndarray:
    """Tr Hess u via nx basis-vector fwd-over-rev passes: (..., 1)."""
    nx = x.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.int32),
                           x.shape[:-1] + (nx,))
    diag = diag_hessian_entries(sol, t, x, idx)
    return jnp.sum(diag, axis=-1, keepdims=True)


def get_f(eq, sol: Solution, s, x, *,
          hess_indices: Optional[jnp.ndarray] = None,
          hutchinson_key=None, hess_store=None) -> jnp.ndarray:
    """Evaluate the PDE nonlinearity at (s, x) under the frozen solution.

    Reference parity: data.py:1226-1325. Dispatch:
      - equation with Hessian term: SDGD sampled diagonal (hess_indices
        given) -> ffi; otherwise full Hessian -> ffh;
      - Laplacian term: Hutchinson (eq.num_v_samples > 0) or exact -> ffl;
      - gradient term: ff(s, x, u, u_x);
      - else: f(s, x, u).
    """
    u, u_x = sol.value_and_grad_x(s, x)
    if eq.has_hessian_term:
        if hess_indices is not None:
            v = hess_indices.shape[-1]
            if (hasattr(eq, "ffi_stats") and _mlp_fast_path(sol)
                    and 4 * v >= min(sol.module.neurons)):
                # gather-free SDGD: ffi consumes only symmetric statistics
                # of the sampled entries, so contract multiplicity counts
                # with the exact full diagonal — numerically identical to
                # gathering the sampled entries (modulo reassociation).
                diag = mlp_hessian_diag(sol, s, x, store=hess_store)
                c = sdgd_index_counts(hess_indices, x.shape[-1])
                m1 = jnp.sum(c * diag, axis=-1, keepdims=True) / v
                m2 = jnp.sum(c * jnp.abs(diag), axis=-1, keepdims=True) / v
                return eq.ffi_stats(s, x, u, m1, m2)
            u_ii = diag_hessian_entries(sol, s, x, hess_indices,
                                        store=hess_store)
            return eq.ffi(s, x, u, u_ii)
        hess = full_hessian(sol, s, x, store=hess_store)
        return eq.ffh(s, x, u, u_x, hess)
    if eq.has_laplacian_term:
        if eq.num_v_samples and eq.num_v_samples > 0:
            assert hutchinson_key is not None
            lap = hutchinson_laplacian(hutchinson_key, sol, s, x,
                                       eq.num_v_samples)
        else:
            lap = exact_laplacian(sol, s, x)
        return eq.ffl(s, x, u, u_x, lap)
    if eq.has_gradient_term:
        return eq.ff(s, x, u, u_x)
    return eq.f(s, x, u)
