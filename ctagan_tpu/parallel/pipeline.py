"""Pipeline parallelism: the residual body staged over a ``pp`` mesh axis.

Fourth parallelism axis (after DP batch, spatial halo, channel TP): GPipe-
style microbatched pipelining. The generator's residual body is a chain of
identical blocks (reference Model/CycleGan.py:40-44), so it stages
naturally: device ``s`` of an S-stage pipeline holds blocks
``[s*k, (s+1)*k)`` (k = n_blocks / S), activations flow stage-to-stage over
ICI via ``lax.ppermute``, and M microbatches keep every stage busy after an
S-1 tick fill. The schedule runs as a ``lax.scan`` over M + S - 1 ticks
inside one ``shard_map`` — a single compiled SPMD program, no host
involvement between ticks.

Stage math is DERIVED FROM THE FLAX MODULES, not re-implemented: each stage
applies the same ``ResidualBlock`` / ``ConvTorch`` / ``ConvTransposeTorch``
classes the ``Generator`` composes (models/layers.py), bound to the exact
param subtrees the Generator creates — so the layer semantics live in one
place and checkpoints interchange bit-for-bit.

TRAINING: the pipelined forward is an ordinary differentiable JAX function
(``shard_map`` + ``scan`` + ``ppermute`` all carry transpose rules), so the
GPipe *backward* schedule is not hand-written either — ``jax.grad`` of the
forward IS the reverse schedule: the scan transpose replays ticks in
reverse with per-tick (= per-microbatch) activation stashes, and the
``ppermute`` transpose carries stage-to-stage cotangents backward over the
same ring. ``pp_train_step_fn`` runs the family's plain train step
(train/steps.py) with the generator swapped for a ``PPGenerator`` adapter;
gradients land stage-sharded, the Adam update is shard-local. Grad parity
with the sequential step is locked by tests/test_parallel_pipeline.py.

Deliberate scope: only the body is staged. Head/down/up/tail are <17% of
the FLOPs, heterogeneous (they would unbalance the stages), and here run
replicated on every device — each stage redundantly computes them, which
costs compute but no communication and keeps the pipeline homogeneous.
InstanceNorm is per-(sample, channel), so microbatching is exact: stats
over a microbatch equal stats over the full batch for each sample.

The pipelined forward equals the sequential generator forward to float
tolerance (locked by tests/test_parallel_pipeline.py). The reference has
no analogue (single GPU). Useful regime: deep-body variants
(n_residual_blocks >> 9) whose weights or activation working set exceed
one chip, with microbatches amortizing the fill/drain bubble.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.35 promotes shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ctagan_tpu.models.layers import (
    ConvTorch,
    ConvTransposeTorch,
    ResidualBlock,
    instance_norm,
    reflect_pad,
)

PP_AXIS = "pp"
DATA_AXIS = "data"


def make_pp_mesh(n_stages: int, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), (PP_AXIS,))


def make_dp_pp_mesh(
    dp: int, n_stages: int, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D (data, pp) mesh: ``dp`` independent pipeline groups, batch
    sharded over ``data``, stages over ``pp``. pp is the minor (fastest-
    varying) axis so each pipeline's stage-to-stage ppermute rides
    neighbouring devices (ICI) while the dp gradient all-reduce crosses
    groups."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * n_stages:
        raise ValueError(
            f"need {dp * n_stages} devices, have {len(devices)}"
        )
    arr = np.array(devices[: dp * n_stages]).reshape(dp, n_stages)
    return Mesh(arr, (DATA_AXIS, PP_AXIS))


def _n_stages(mesh: Mesh) -> int:
    """Stage count = the pp-axis extent (mesh may also carry a data axis)."""
    return dict(zip(mesh.axis_names, mesh.devices.shape))[PP_AXIS]


def _x_spec(mesh: Mesh) -> P:
    """Batch spec: sharded over data when the mesh has a dp axis (each
    pipeline group runs the schedule on its batch shard), replicated on a
    pure-pp mesh."""
    return P(DATA_AXIS) if DATA_AXIS in mesh.axis_names else P()


# ---------------------------------------------------------------------------
# Stage functions: the Generator's own Flax modules applied to its own
# param subtrees (Generator.__call__ structure, models/generator.py)
# ---------------------------------------------------------------------------

def _apply_block(generator, bp, h):
    """One residual-body block — the actual ``ResidualBlock`` module."""
    return ResidualBlock(
        generator.base_features * 4,
        dtype=generator.dtype,
        pad_mode=generator.pad_mode,
    ).apply({"params": bp}, h)


def _head_down(generator, pr, x):
    """c7s1-64 head + the two stride-2 down convs (replicated prologue)."""
    g = generator
    f = g.base_features
    zero = g.pad_mode == "zero"
    if zero:
        h = ConvTorch(f, 7, padding=3, dtype=g.dtype).apply(
            {"params": pr["ConvTorch_0"]}, x
        )
    else:
        h = ConvTorch(f, 7, dtype=g.dtype).apply(
            {"params": pr["ConvTorch_0"]}, reflect_pad(x, 3)
        )
    h = jax.nn.relu(instance_norm(h))
    for i, mult in enumerate((2, 4)):
        h = ConvTorch(f * mult, 3, stride=2, padding=1, dtype=g.dtype).apply(
            {"params": pr[f"ConvTorch_{i + 1}"]}, h
        )
        h = jax.nn.relu(instance_norm(h))
    return h


def _up_tail(generator, pr, h):
    """Transposed-conv up path + 7x7 tail + tanh (replicated epilogue)."""
    g = generator
    f = g.base_features
    zero = g.pad_mode == "zero"
    for i, mult in enumerate((2, 1)):
        h = ConvTransposeTorch(f * mult, dtype=g.dtype).apply(
            {"params": pr[f"ConvTransposeTorch_{i}"]}, h
        )
        h = jax.nn.relu(instance_norm(h))
    if zero:
        h = ConvTorch(g.output_nc, 7, padding=3, dtype=g.dtype).apply(
            {"params": pr["ConvTorch_3"]}, h
        )
    else:
        h = ConvTorch(g.output_nc, 7, dtype=g.dtype).apply(
            {"params": pr["ConvTorch_3"]}, reflect_pad(h, 3)
        )
    return jnp.tanh(h)


# ---------------------------------------------------------------------------
# Param layout: (S, k)-stacked body + replicated rest
# ---------------------------------------------------------------------------

def _stack_body_params(params, n_blocks: int, n_stages: int):
    """(S, k)-stacked per-stage block params from a Generator param tree."""
    if n_blocks % n_stages:
        raise ValueError(
            f"n_residual_blocks={n_blocks} must divide into {n_stages} stages"
        )
    blocks = [params["params"][f"ResidualBlock_{i}"] for i in range(n_blocks)]
    k = n_blocks // n_stages
    stages = [
        jax.tree.map(lambda *xs: jnp.stack(xs), *blocks[s * k : (s + 1) * k])
        for s in range(n_stages)
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)  # (S, k, ...)


def pp_pack_params(params, n_blocks: int, n_stages: int):
    """Generator param tree -> {'body': (S, k, ...) stacked, 'rest': ...}."""
    pr = params["params"]
    rest = {k: v for k, v in pr.items() if not k.startswith("ResidualBlock_")}
    return {
        "body": _stack_body_params(params, n_blocks, n_stages),
        "rest": rest,
    }


def pp_unpack_params(packed, n_blocks: int):
    """Inverse of ``pp_pack_params`` -> a normal Generator param tree."""
    body = packed["body"]  # (S, k, ...) leaves
    leaves0 = jax.tree.leaves(body)
    s, k = leaves0[0].shape[0], leaves0[0].shape[1]
    assert s * k == n_blocks, (s, k, n_blocks)
    out = dict(packed["rest"])
    for i in range(n_blocks):
        out[f"ResidualBlock_{i}"] = jax.tree.map(
            lambda a: a[i // k, i % k], body
        )
    return {"params": out}


def _place_packed(packed, mesh: Mesh):
    """body sharded on the pp axis, rest replicated."""
    body = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(PP_AXIS))),
        packed["body"],
    )
    rest = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), packed["rest"]
    )
    return {"body": body, "rest": rest}


# ---------------------------------------------------------------------------
# The GPipe program (forward; backward falls out of autodiff)
# ---------------------------------------------------------------------------

def _pp_program(generator, mesh: Mesh, microbatches: int):
    """shard_map'd ``(packed_params, x) -> y`` running the GPipe schedule.

    On a 2-D (data, pp) mesh each data-parallel group runs its own pipeline
    over its batch shard — the schedule below only ever names the pp axis,
    so the same program serves both mesh shapes; GSPMD/shard_map transpose
    inserts the dp gradient all-reduce for the replicated params."""
    n_stages = _n_stages(mesh)
    M = microbatches

    def fn(body_params, rest_p, xin):
        # body_params leaves: (1, k, ...) local shard — drop the stage dim
        sp = jax.tree.map(lambda a: a[0], body_params)
        s = jax.lax.axis_index(PP_AXIS)
        h0 = _head_down(generator, rest_p, xin)  # replicated prologue
        mb = h0.shape[0] // M
        h_mb = h0.reshape(M, mb, *h0.shape[1:])

        def blocks(a):
            k = jax.tree.leaves(sp)[0].shape[0]
            for i in range(k):
                a = _apply_block(
                    generator, jax.tree.map(lambda t: t[i], sp), a
                )
            return a

        carry = jnp.zeros_like(h_mb[0])
        out = jnp.zeros_like(h_mb)

        def tick(state, t):
            carry, out = state
            feed = jax.lax.dynamic_index_in_dim(
                h_mb, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            a = jnp.where(s == 0, feed, carry)
            y = blocks(a)
            idx = t - (n_stages - 1)
            write = jnp.where(
                (s == n_stages - 1) & (idx >= 0),
                y,
                jax.lax.dynamic_index_in_dim(
                    out, jnp.maximum(idx, 0), 0, keepdims=False
                ),
            )
            out = jax.lax.dynamic_update_index_in_dim(
                out, write, jnp.maximum(idx, 0), 0
            )
            carry = jax.lax.ppermute(
                y, PP_AXIS, [(i, i + 1) for i in range(n_stages - 1)]
            )
            return (carry, out), None

        (carry, out), _ = jax.lax.scan(
            tick, (carry, out), jnp.arange(M + n_stages - 1)
        )
        # only the last stage holds real outputs; psum broadcasts them
        out = jax.lax.psum(
            jnp.where(s == n_stages - 1, out, jnp.zeros_like(out)), PP_AXIS
        )
        body = out.reshape(h0.shape)
        return _up_tail(generator, rest_p, body)  # replicated epilogue

    xs = _x_spec(mesh)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(PP_AXIS), P(), xs),
        out_specs=xs,
        check_vma=False,
    )


def pipeline_generator_forward(
    generator,
    params,
    x,
    mesh: Optional[Mesh] = None,
    microbatches: int = 2,
):
    """Generator forward with the residual body pipelined over ``mesh``.

    ``x``: (B, H, W, C) with B divisible by ``microbatches``. Returns the
    full-batch output, equal to ``generator.apply(params, x)`` up to float
    reordering.
    """
    mesh = mesh or make_pp_mesh(len(jax.devices()))
    n_stages = _n_stages(mesh)
    packed = pp_pack_params(params, generator.n_residual_blocks, n_stages)
    xs = jnp.asarray(x)
    if xs.shape[0] % microbatches:
        raise ValueError(
            f"batch {xs.shape[0]} must divide into {microbatches} microbatches"
        )
    prog = _pp_program(generator, mesh, microbatches)
    fwd = jax.jit(lambda pk, a: prog(pk["body"], pk["rest"], a))
    return fwd(_place_packed(packed, mesh), xs)


# ---------------------------------------------------------------------------
# Pipeline-parallel TRAINING
# ---------------------------------------------------------------------------

class PPGenerator:
    """Adapter exposing ``.apply(packed_params, x)`` over the pipelined
    program, so the family train steps in train/steps.py run UNCHANGED with
    the generator pipelined — the steps only ever call ``g_model.apply``.
    """

    def __init__(self, generator, mesh: Mesh, microbatches: int):
        self.generator = generator
        self.mesh = mesh
        self.microbatches = microbatches
        self._prog = _pp_program(generator, mesh, microbatches)

    def apply(self, packed_params, x):
        return self._prog(packed_params["body"], packed_params["rest"], x)


def shard_state_pp(state, generator, mesh: Mesh):
    """Re-lay a family train state for pipeline training: g_params and the
    G Adam moments go to the stacked-and-stage-sharded layout (moments
    mirror params, so the same pack applies); EVERY other field (D, the reg
    family's R net and its moments, rng) replicates. Generic over the state
    dataclass — works for ``steps.P2pState`` and ``steps.RegState`` alike.
    The packed zeros of a fresh Adam state equal the sequential init, so
    grads-then-update equals the sequential step (locked by test)."""
    n_blocks = generator.n_residual_blocks
    n_stages = _n_stages(mesh)
    pack = lambda t: pp_pack_params(t, n_blocks, n_stages)
    repl = lambda t: jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), t
    )
    g_opt = state.g_opt
    # optax.scale_by_adam state: (count, mu, nu) with mu/nu mirroring params
    g_opt_pp = g_opt._replace(
        mu=_place_packed(pack(g_opt.mu), mesh),
        nu=_place_packed(pack(g_opt.nu), mesh),
        count=jax.device_put(g_opt.count, NamedSharding(mesh, P())),
    )
    out = {
        "g_params": _place_packed(pack(state.g_params), mesh),
        "g_opt": g_opt_pp,
        "g_ema": None if state.g_ema is None else _place_packed(
            pack(state.g_ema), mesh
        ),
    }
    for f in dataclasses.fields(state):
        if f.name in out:
            continue
        v = getattr(state, f.name)
        out[f.name] = None if v is None else repl(v)
    return dataclasses.replace(state, **out)


def unshard_state_pp(state, generator):
    """Inverse re-layout: back to the sequential family state (for
    checkpoints / eval with the plain generator)."""
    n_blocks = generator.n_residual_blocks
    unpack = lambda t: pp_unpack_params(jax.device_get(t), n_blocks)
    g_opt = state.g_opt._replace(
        mu=unpack(state.g_opt.mu), nu=unpack(state.g_opt.nu)
    )
    return dataclasses.replace(
        state,
        g_params=unpack(state.g_params),
        g_opt=g_opt,
        g_ema=None if state.g_ema is None else unpack(state.g_ema),
    )


# Historical names (P2p was the first pipelined family); the generic
# versions above subsume them.
shard_p2p_state_pp = shard_state_pp
unshard_p2p_state_pp = unshard_state_pp


def pp_reg_train_step_fn(
    g_model,
    r_model,
    d_model,
    tx,
    cfg,
    mesh: Mesh,
    microbatches: int,
    dual_window_mode: bool = False,
    stage2: bool = False,
    schedule: str = "gpipe",
):
    """The reg-family (RegGAN / HD stage-1 / HD stage-2) train step with
    the GENERATOR pipelined over the ``pp`` mesh — the flagship three-net
    step's G forward+backward runs through the pipeline schedule, while R
    and D stay replicated (the ResUNet is encoder-decoder shaped — no
    homogeneous stage split — and together with D carries <25% of the
    step FLOPs; reference hot loop HdTrainer.py:204-228).
    ``steps.reg_train_step`` runs UNCHANGED with the ``PPGenerator``
    adapter swapped in; call with a state placed by ``shard_state_pp``.

    ``schedule='gpipe'``: backward = autodiff transpose of the forward
    scan (stashes grow with the microbatch count M).
    ``schedule='1f1b'``: the G+R value-and-grad runs through the
    hand-scheduled one-forward-one-backward program — O(S) in-flight
    stashes independent of M, with R's fwd+bwd inside the per-microbatch
    loss epilogue (steps.reg_train_step's ``pipeline_1f1b`` hook)."""
    from functools import partial

    from ctagan_tpu.train import steps

    g = g_model.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    ppg = PPGenerator(g, mesh, microbatches)
    if schedule not in ("gpipe", "1f1b"):
        raise ValueError(f"unknown pp schedule {schedule!r} (gpipe | 1f1b)")
    pl = (g, mesh, microbatches) if schedule == "1f1b" else None
    fn = partial(steps.reg_train_step, ppg, r_model, d_model, tx, cfg)

    @jax.jit
    def step(state, batch, lr, lr_d):
        return fn(
            state, batch, lr, lr_d=lr_d,
            dual_window_mode=dual_window_mode, stage2=stage2,
            pipeline_1f1b=pl,
        )

    return step


def pp_train_step_fn(
    g_model,
    d_model,
    tx,
    cfg,
    mesh: Mesh,
    microbatches: int,
    schedule: str = "gpipe",
):
    """A jitted P2p train step with the generator PIPELINED end-to-end.

    ``schedule='gpipe'``: forward through the GPipe scan, backward through
    its autodiff transpose (reverse-tick scan + reversed ppermute ring).
    The scan transpose stashes per-TICK residuals, so activation memory
    grows with the microbatch count M — fine for small M, wrong shape for
    the long-pipeline regime GPipe is meant for.

    ``schedule='1f1b'``: the hand-scheduled one-forward-one-backward
    program (``_pp_1f1b_grad_program``) — each microbatch's backward starts
    as soon as the last stage finishes its forward, so a stage holds at
    most O(S) in-flight stage-input stashes instead of O(M), with the
    stage forward recomputed inside its backward tick (remat). Same math:
    grads equal the sequential step's up to float ordering (locked by
    tests/test_parallel_pipeline.py).

    Call with a state placed by ``shard_p2p_state_pp`` and a replicated
    batch; returns ``step(state, batch, lr) -> (state, losses)``.
    """
    from functools import partial

    from ctagan_tpu.train import steps

    g = g_model.clone(fused_body=False, fused_body_grad=False, tap_heads=False)
    ppg = PPGenerator(g, mesh, microbatches)
    if schedule == "gpipe":
        return jax.jit(partial(steps.p2p_train_step, ppg, d_model, tx, cfg))
    if schedule != "1f1b":
        raise ValueError(f"unknown pp schedule {schedule!r} (gpipe | 1f1b)")

    prog = _pp_1f1b_grad_program(g, d_model, cfg, mesh, microbatches)

    def step(state, batch, lr):
        # Mirrors steps.p2p_train_step exactly (rng split, augmentation,
        # reference D-update order/quirks, ramped EMA) with the G update's
        # value_and_grad replaced by the 1F1B pipelined program.
        rng, ka, kb = jax.random.split(state.rng, 3)
        if bool(cfg.get("aligned_aug", False)):
            kb = ka
        from ctagan_tpu.ops.augment import random_affine

        a = random_affine(ka, batch["A"], cfg["noise_level"])
        b = random_affine(kb, batch["B"], cfg["noise_level"])
        (g_loss, (l1v, advv)), g_grads = prog(
            state.g_params["body"], state.g_params["rest"],
            state.d_params, a, b,
        )
        g_grads = {"body": g_grads[0], "rest": g_grads[1]}
        g_params, g_opt = steps._apply(
            tx, g_grads, state.g_opt, state.g_params, lr
        )

        def d_loss_fn(dp):
            # reference order: D sees the UPDATED generator's fake, and
            # scales the *predictions* by Adv_lamda (p2pTrainer.py:143-145)
            fake2 = jax.lax.stop_gradient(ppg.apply(g_params, a))
            pf = d_model.apply(
                dp, jnp.concatenate([a, fake2], -1)
            ) * cfg["Adv_lamda"]
            pr = d_model.apply(
                dp, jnp.concatenate([a, b], -1)
            ) * cfg["Adv_lamda"]
            return (
                jnp.mean((pf - jnp.zeros_like(pf)) ** 2)
                + jnp.mean((pr - jnp.ones_like(pr)) ** 2)
            ), ()

        (d_loss, _), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_params, d_opt = steps._apply(
            tx, d_grads, state.d_opt, state.d_params, lr
        )
        g_ema = steps._ema_update(
            state.g_ema, g_params, cfg.get("ema_decay", 0.999),
            count=g_opt.count,
        )
        new_state = dataclasses.replace(
            state, g_params=g_params, d_params=d_params, g_opt=g_opt,
            d_opt=d_opt, rng=rng, g_ema=g_ema,
        )
        return new_state, {
            "loss_G": g_loss,
            "loss_L1": l1v,
            "loss_GAN_A2B": advv,
            "loss_D_B": d_loss,
        }

    return jax.jit(step)


# ---------------------------------------------------------------------------
# 1F1B: hand-scheduled forward+backward pipeline (PipeDream-flush style)
# ---------------------------------------------------------------------------


def pp_1f1b_value_and_grad(generator, mesh: Mesh, microbatches, epilogue):
    """Generic 1F1B value-and-grad engine: shard_map'd
    ``(body_params, rest_p, extras, frozen, arrays) ->
    ((loss, aux), (body_grads, rest_grads, extras_grads))``.

    ``epilogue(rest_p, extras, frozen, y, mb) -> (loss, aux)`` is the
    per-microbatch loss run on the last stage's body output ``y`` —
    up/tail plus whatever loss terms the family needs. ``extras`` is a
    pytree of ADDITIONAL differentiated params (e.g. the reg family's
    ResUNet params — its whole fwd+bwd runs inside the epilogue),
    ``frozen`` a non-differentiated pytree (e.g. D params for the
    adversarial term), and ``mb`` the per-microbatch slice of the
    ``arrays`` dict (key ``'a'`` is the generator input that feeds the
    pipeline; every other key is epilogue-only). ``aux`` must be a pytree
    of scalars with input-independent structure; per-microbatch values
    are averaged over microbatches (exact for elementwise-mean losses;
    mask-normalized terms weight microbatches equally — the same
    convention grad_accum documents, train/steps.py:603-607).

    Why not autodiff the GPipe scan? Its transpose replays the whole
    forward scan before any backward tick, stashing residuals for all
    M + S - 1 ticks — O(M) activation memory per stage, which defeats the
    point of pipelining deep bodies with many microbatches. Here the
    backward is scheduled BY HAND to start the moment the last stage
    finishes a microbatch's forward (the 1F1B steady state: each stage
    alternates one fwd, one bwd per tick):

      tick u, stage s:  FWD of microbatch  u - s
                        BWD of microbatch  u - (2S - 2 - s)

    so microbatch m's stage-input stash lives only 2(S-1-s) ticks — a
    ring of ``2(S-1)+1`` slots per stage bounds in-flight activations at
    O(S) independent of M. The stage backward recomputes its forward from
    the stashed INPUT (remat), so nothing else is stashed. Activation
    cotangents ride the reversed ppermute ring; the per-microbatch loss
    epilogue (replicated — like the head/tail forward in ``_pp_program``)
    runs where the last stage's output lands, seeding the backward at 1/M
    per microbatch so the total equals the full-batch mean loss. On a 2-D
    (data, pp) mesh each dp group runs its own schedule on its batch
    shard; grads and loss scalars are pmean'd over dp at the end.
    """
    S = _n_stages(mesh)
    has_dp = DATA_AXIS in mesh.axis_names
    M = microbatches
    T = M + 2 * (S - 1)  # last backward: stage 0, microbatch M-1
    R = 2 * (S - 1) + 1  # stash ring depth (max stash lifetime + 1)

    def fn(body_params, rest_p, extras, frozen, arrays):
        sp = jax.tree.map(lambda t: t[0], body_params)  # (k, ...) local
        s = jax.lax.axis_index(PP_AXIS)
        a = arrays["a"]
        mb = a.shape[0] // M
        mb_arrays = {
            key: v.reshape(M, v.shape[0] // M, *v.shape[1:])
            for key, v in arrays.items()
        }
        a_mb = mb_arrays["a"]
        k = jax.tree.leaves(sp)[0].shape[0]

        def blocks(sp_, h):
            for i in range(k):
                h = _apply_block(
                    generator, jax.tree.map(lambda t: t[i], sp_), h
                )
            return h

        h_sd = jax.eval_shape(
            lambda rp, x: _head_down(generator, rp, x), rest_p, a_mb[0]
        )
        zero_h = jnp.zeros(h_sd.shape, h_sd.dtype)
        acc_t = jnp.promote_types(jnp.float32, a.dtype)
        mb0 = {key: v[0] for key, v in mb_arrays.items()}
        _, aux_sd = jax.eval_shape(
            lambda rp, ex, fz, yy, m: epilogue(rp, ex, fz, yy, m),
            rest_p, extras, frozen, h_sd, mb0,
        )
        fwd_ring = [(i, i + 1) for i in range(S - 1)]
        bwd_ring = [(i + 1, i) for i in range(S - 1)]

        def tick(carry, u):
            cf, cb, stash, bg, rg, exg, hg, lo, auxa = carry
            # ---- forward slot: microbatch u - s ----
            mf = u - s
            mf_ok = (mf >= 0) & (mf < M)
            mf_c = jnp.clip(mf, 0, M - 1)
            feed = jax.lax.dynamic_index_in_dim(
                a_mb, mf_c, 0, keepdims=False
            )
            h0 = _head_down(generator, rest_p, feed)
            a_in = jnp.where(s == 0, h0, cf)
            stash = jnp.where(
                mf_ok,
                jax.lax.dynamic_update_index_in_dim(
                    stash, a_in, mf_c % R, 0
                ),
                stash,
            )
            y = blocks(sp, a_in)
            # ---- loss epilogue on the last stage's fresh output ----
            y_last = jax.lax.psum(
                jnp.where(s == S - 1, y, jnp.zeros_like(y)), PP_AXIS
            )
            me = u - (S - 1)
            me_ok = (me >= 0) & (me < M)
            me_c = jnp.clip(me, 0, M - 1)
            mb_e = {
                key: jax.lax.dynamic_index_in_dim(v, me_c, 0, keepdims=False)
                for key, v in mb_arrays.items()
            }
            loss_m, vjp_e, aux_m = jax.vjp(
                lambda rp, ex, yy: epilogue(rp, ex, frozen, yy, mb_e),
                rest_p, extras, y_last, has_aux=True,
            )
            rg_m, exg_m, dy = vjp_e(jnp.asarray(1.0 / M, loss_m.dtype))
            lo = lo + jnp.where(me_ok, loss_m / M, 0.0).astype(lo.dtype)
            auxa = jax.tree.map(
                lambda acc, v: acc
                + jnp.where(me_ok, v / M, 0.0).astype(acc.dtype),
                auxa, aux_m,
            )
            rg = jax.tree.map(
                lambda acc, g: acc + jnp.where(me_ok, g, jnp.zeros_like(g)),
                rg, rg_m,
            )
            exg = jax.tree.map(
                lambda acc, g: acc + jnp.where(me_ok, g, jnp.zeros_like(g)),
                exg, exg_m,
            )
            # ---- backward slot: microbatch u - (2S - 2 - s) ----
            mbi = u - (2 * S - 2 - s)
            mb_ok = (mbi >= 0) & (mbi < M)
            mb_c = jnp.clip(mbi, 0, M - 1)
            g_in = jnp.where(s == S - 1, dy, cb)
            a_st = jax.lax.dynamic_index_in_dim(
                stash, mb_c % R, 0, keepdims=False
            )
            _, vjp_b = jax.vjp(blocks, sp, a_st)  # remat: fwd recomputed
            bg_m, a_cot = vjp_b(g_in)
            bg = jax.tree.map(
                lambda acc, g: acc + jnp.where(mb_ok, g, jnp.zeros_like(g)),
                bg, bg_m,
            )
            # stage 0's input cotangent drives the head/down backward
            feed_b = jax.lax.dynamic_index_in_dim(
                a_mb, mb_c, 0, keepdims=False
            )
            _, vjp_h = jax.vjp(
                lambda rp: _head_down(generator, rp, feed_b), rest_p
            )
            (hg_m,) = vjp_h(a_cot)
            hmask = mb_ok & (s == 0)
            hg = jax.tree.map(
                lambda acc, g: acc + jnp.where(hmask, g, jnp.zeros_like(g)),
                hg, hg_m,
            )
            cf = jax.lax.ppermute(y, PP_AXIS, fwd_ring)
            cb = jax.lax.ppermute(a_cot, PP_AXIS, bwd_ring)
            return (cf, cb, stash, bg, rg, exg, hg, lo, auxa), None

        carry0 = (
            zero_h,
            zero_h,
            jnp.zeros((R,) + zero_h.shape, zero_h.dtype),
            jax.tree.map(jnp.zeros_like, sp),
            jax.tree.map(jnp.zeros_like, rest_p),
            jax.tree.map(jnp.zeros_like, extras),
            jax.tree.map(jnp.zeros_like, rest_p),
            jnp.zeros((), acc_t),
            jax.tree.map(
                lambda sd: jnp.zeros(
                    (), jnp.promote_types(jnp.float32, sd.dtype)
                ),
                aux_sd,
            ),
        )
        carry, _ = jax.lax.scan(tick, carry0, jnp.arange(T))
        _, _, _, bg, rg, exg, hg, lo, auxa = carry
        # head grads live only on stage 0; epilogue grads are identical on
        # every stage (computed from the psum-broadcast y). Sum + replicate.
        hg = jax.lax.psum(hg, PP_AXIS)
        rest_g = jax.tree.map(lambda x, y_: x + y_, rg, hg)
        if has_dp:
            # each dp group computed its group-mean loss grads; the global
            # loss is the mean over groups -> pmean grads + scalars over dp
            bg = jax.lax.pmean(bg, DATA_AXIS)
            rest_g = jax.lax.pmean(rest_g, DATA_AXIS)
            exg = jax.lax.pmean(exg, DATA_AXIS)
            lo = jax.lax.pmean(lo, DATA_AXIS)
            auxa = jax.lax.pmean(auxa, DATA_AXIS)
        body_g = jax.tree.map(lambda t: t[None], bg)  # local (1, k, ...)
        return (lo, auxa), (body_g, rest_g, exg)

    xs = _x_spec(mesh)
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(PP_AXIS), P(), P(), P(), xs),
        out_specs=((P(), P()), (P(PP_AXIS), P(), P())),
        check_vma=False,
    )


def _pp_1f1b_grad_program(generator, d_model, cfg, mesh: Mesh, microbatches):
    """P2p 1F1B program: ``(body_params, rest_p, d_params, a, b) ->
    ((loss, (l1, adv)), (body_grads, rest_grads))`` — the generic
    ``pp_1f1b_value_and_grad`` engine with the P2p loss epilogue
    (up/tail + L1 + D adversarial term; reference semantics
    p2pTrainer.py:127-141)."""
    from ctagan_tpu.ops import losses as L

    def epilogue(rest_p, extras, d_params, y, mb):
        fake = _up_tail(generator, rest_p, y)
        l1 = L.l1(fake, mb["b"]) * cfg["P2P_lamda"]
        pred = d_model.apply(d_params, jnp.concatenate([mb["a"], fake], -1))
        adv = L.mse(pred, jnp.ones_like(pred)) * cfg["Adv_lamda"]
        return l1 + adv, (l1, adv)

    prog = pp_1f1b_value_and_grad(generator, mesh, microbatches, epilogue)

    def wrapped(body_params, rest_p, d_params, a, b):
        (lo, aux), (bg, rg, _exg) = prog(
            body_params, rest_p, (), d_params, {"a": a, "b": b}
        )
        return (lo, aux), (bg, rg)

    return wrapped
