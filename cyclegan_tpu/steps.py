"""Jitted CycleGAN train/validate steps.

TPU-first re-design of the reference's ``@tf.function`` steps
(cyclegan/model.py:91-154). The reference runs one shared forward set
(6 generator + 4 discriminator applications) under a persistent
GradientTape and then four separate backward passes (tape.gradient x4,
cyclegan/model.py:143-147). Here the same gradient flow is produced by a
SINGLE backward pass over one scalar:

- adversarial generator terms use discriminators with **stop_gradient on
  the discriminator params**, so they contribute only generator gradients;
- discriminator terms use **stop_gradient on the fake images**, so they
  contribute only discriminator gradients;
- the two fake-view discriminator applications (generator view / disc
  view) share ONE forward through a dual-view custom VJP
  (:func:`_dual_disc_views`) — XLA CSE deduped them in pure-XLA mode but
  not in Pallas kernel mode — so the forward cost stays at 6 G + 4 D
  applications.

The per-parameter-group gradients of this scalar are exactly the
reference's four tape.gradients, including the shared cycle term flowing
into both generators (cyclegan/model.py:108-121) and the adversarial loss
NOT stopping gradients through the discriminators for the generator update.
``tests/test_steps.py`` asserts equality against a naive 4-backward
implementation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from cyclegan_tpu.losses import (
    accuracy,
    calc_cycle_loss,
    discriminator_loss,
    generator_loss,
    get_loss_obj,
    identity_loss,
)
from cyclegan_tpu.models.base import Model

NETWORKS = ("g_AB", "g_BA", "d_A", "d_B")


@jax.tree_util.register_pytree_with_keys_class
@dataclasses.dataclass
class TrainState:
    """One pytree holding everything the reference keeps in the stateful
    ``CycleGan`` object: 4 networks' params + model state, 4 optimizer
    states, the step RNG and the epoch/step counters
    (cyclegan/model.py:58-89).

    Flattened with NAMED keys so checkpoints store human-readable leaf
    paths (``params/g_AB/...``) — which also lets inference restore params
    without knowing the optimizer structure (utils/checkpoint.py keeps a
    fallback for the round-1 positional key format)."""

    params: Dict[str, Any]
    model_state: Dict[str, Any]
    opt_state: Dict[str, Any]
    rng: jax.Array
    step: jnp.ndarray

    _FIELDS = ("params", "model_state", "opt_state", "rng", "step")

    def tree_flatten_with_keys(self):
        children = tuple(
            (jax.tree_util.GetAttrKey(name), getattr(self, name))
            for name in self._FIELDS
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)


def init_train_state(
    key: jax.Array,
    models: Mapping[str, Model],
    optimizers: Mapping[str, optax.GradientTransformation],
) -> TrainState:
    """Initialize all four networks and their optimizers from one key."""
    keys = jax.random.split(key, len(NETWORKS) + 1)
    params: Dict[str, Any] = {}
    model_state: Dict[str, Any] = {}
    opt_state: Dict[str, Any] = {}
    for net_key, name in zip(keys[:-1], NETWORKS):
        params[name], model_state[name] = models[name].init(net_key)
        opt_state[name] = optimizers[name].init(params[name])
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=opt_state,
        rng=keys[-1],
        step=jnp.zeros((), jnp.int32),
    )


def _cast_floats(tree: Any, dtype) -> Any:
    """Cast floating leaves of a pytree to ``dtype`` (mixed-precision
    compute cast; integer leaves untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def _dual_disc_views(d_apply, p, x):
    """One discriminator forward, two gradient views.

    ``y_gen = d(stop_grad(p), x)`` and ``y_d = d(p, stop_grad(x))`` are
    forward-identical, and the module docstring's round-1 design relied
    on XLA CSE to dedupe them. That holds for XLA-lowered convs but NOT
    for Pallas kernels: custom-calls are not CSE candidates, so in
    ``tpu_layout`` kernel mode the step silently paid two extra
    discriminator forwards (trace: 6 disc applications/step instead of
    4). This wrapper shares ONE primal application and routes the two
    cotangents separately: the generator-view cotangent pulls back only
    into ``x`` (adversarial terms update the generators), the
    discriminator-view cotangent only into ``p``. Each pullback's unused
    half is dead code — pallas_call lowers side-effect-free, so XLA
    drops the dead dX/dW kernels.

    ``d_apply(p, x)`` must return ``(y, state)``; state updates are
    non-differentiable aux, as everywhere else in the step. Returns
    ``(y_gen, y_view_d, new_state)``.
    """

    @jax.custom_vjp
    def dual(p, x):
        y, st = d_apply(p, x)
        return y, y, st

    def fwd(p, x):
        y, vjp, st = jax.vjp(d_apply, p, x, has_aux=True)
        return (y, y, st), vjp

    def bwd(vjp, cts):
        g_gen, g_d, _ = cts  # state cotangent ignored (aux)
        _, dx = vjp(g_gen)
        dp, _ = vjp(g_d)
        return dp, dx

    dual.defvjp(fwd, bwd)
    return dual(p, x)


def _forward_losses(
    params: Dict[str, Any],
    model_state: Dict[str, Any],
    models: Mapping[str, Model],
    loss_obj: Callable,
    loss_weights: Mapping[str, float],
    real_a: jnp.ndarray,
    real_b: jnp.ndarray,
    train: bool,
    rng: Optional[jax.Array],
    stop_grads: bool,
    compute_dtype=jnp.float32,
    remat: bool = False,
    tpu_layout: bool = False,
    fuse_apps: bool = False,
    pallas_kernels: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Shared forward set + losses (reference: validate_step,
    cyclegan/model.py:91-134).

    Returns (surrogate_total, metrics, new_model_state). With
    ``stop_grads=True`` the surrogate's gradient w.r.t. each parameter
    group equals the reference's per-group tape.gradient.

    ``compute_dtype=bfloat16`` runs the network forward/backward in bf16
    (single-pass MXU with f32 accumulation inside the convs) while master
    params stay f32 — the cast is differentiable, so gradients come back
    f32. Losses are always computed in f32.
    """
    if tpu_layout:
        # Lane-dense NHCW execution (ops/layout.py): transpose the batch
        # once here; every op below consults the scoped flag. Pure
        # execution detail -- params, losses and metrics are unchanged.
        # The Pallas kernel pack is scoped alongside the layout
        # (ops/packctx.py): the enable/interpret decision is captured at
        # trace time per step, so a tpu_layout step and an f32 parity
        # step coexist in one process without touching module globals.
        from cyclegan_tpu.ops import layout as _layout
        from cyclegan_tpu.ops import packctx as _packctx

        # pallas_kernels=False is the NHCW-without-kernel-pack ablation
        # (bench.py --no-pallas-kernels); scope(False) pins the pack OFF
        # for this trace even though the layout is lane-dense.
        with _layout.nhcw(), _packctx.scope(pallas_kernels):
            return _forward_losses(
                params, model_state, models, loss_obj, loss_weights,
                _layout.to_nhcw(real_a), _layout.to_nhcw(real_b),
                train, rng, stop_grads, compute_dtype, remat,
                tpu_layout=False, fuse_apps=fuse_apps,
            )
    sg = jax.lax.stop_gradient if stop_grads else (lambda x: x)
    if compute_dtype != jnp.float32:
        params = _cast_floats(params, compute_dtype)
        real_a_net = real_a.astype(compute_dtype)
        real_b_net = real_b.astype(compute_dtype)
    else:
        real_a_net, real_b_net = real_a, real_b
    rngs = (
        jax.random.split(rng, 6)
        if rng is not None
        else [None] * 6
    )

    def g_ab(x, r):
        return models["g_AB"].apply(params["g_AB"], model_state["g_AB"], x,
                                     train=train, rng=r)

    def g_ba(x, r):
        return models["g_BA"].apply(params["g_BA"], model_state["g_BA"], x,
                                     train=train, rng=r)

    if remat:
        # Rematerialize the six generator forwards in the backward pass —
        # trades FLOPs for HBM so larger batches/resolutions fit
        # (SURVEY.md: jax.checkpoint as the TPU memory lever).
        g_ab = jax.checkpoint(g_ab)
        g_ba = jax.checkpoint(g_ba)

    def d_a(p, x):
        return models["d_A"].apply(p, model_state["d_A"], x, train=train)

    def d_b(p, x):
        return models["d_B"].apply(p, model_state["d_B"], x, train=train)

    if fuse_apps and models["g_AB"].batchable and models["g_BA"].batchable:
        # The translation and identity applications of each generator are
        # independent (reference: cyclegan/model.py:93-106 computes them
        # as four separate calls), and per-sample networks (instance
        # norm, no dropout — Model.batchable) commute with batch
        # concatenation, so run each generator once on the stacked pair:
        # 6 generator applications become 4 (two at batch 2N). Identical
        # math, fewer fusion instances per step. Opt-in (fuse_apps knob):
        # measured +12% on the ResNet recipe (61.4 -> 68.9 img/s) but -2%
        # on the default skip-concat U-Net (56.7 -> 55.6), so each recipe
        # chooses (BASELINE.md).
        n = real_a_net.shape[0]
        out_ab, st_gab1 = g_ab(
            jnp.concatenate([real_a_net, real_b_net], axis=0), rngs[0]
        )
        fake_b, same_b = out_ab[:n], out_ab[n:]
        out_ba, st_gba1 = g_ba(
            jnp.concatenate([real_b_net, real_a_net], axis=0), rngs[2]
        )
        fake_a, same_a = out_ba[:n], out_ba[n:]
        cycled_a, st_gba2 = g_ba(fake_b, rngs[1])
        cycled_b, st_gab2 = g_ab(fake_a, rngs[3])
    else:
        fake_b, st_gab1 = g_ab(real_a_net, rngs[0])
        cycled_a, st_gba1 = g_ba(fake_b, rngs[1])
        fake_a, st_gba2 = g_ba(real_b_net, rngs[2])
        cycled_b, st_gab2 = g_ab(fake_a, rngs[3])
        same_a, _ = g_ba(real_a_net, rngs[4])
        same_b, _ = g_ab(real_b_net, rngs[5])

    disc_real_a, st_da1 = d_a(params["d_A"], real_a_net)
    disc_real_b, st_db1 = d_b(params["d_B"], real_b_net)
    if stop_grads:
        # Generator-view (disc params stopped: adversarial terms backprop
        # only into the generators) and discriminator-view (fakes
        # stopped) outputs share ONE forward via the dual-view custom
        # VJP — see _dual_disc_views for why CSE alone is not enough in
        # Pallas kernel mode.
        disc_fake_a_gen, disc_fake_a_d, st_da2 = _dual_disc_views(
            d_a, params["d_A"], fake_a
        )
        disc_fake_b_gen, disc_fake_b_d, st_db2 = _dual_disc_views(
            d_b, params["d_B"], fake_b
        )
    else:
        # No-stop-gradient mode (validate/metrics): plain applications.
        disc_fake_a_gen, _ = d_a(params["d_A"], fake_a)
        disc_fake_b_gen, _ = d_b(params["d_B"], fake_b)
        disc_fake_a_d, st_da2 = d_a(params["d_A"], fake_a)
        disc_fake_b_d, st_db2 = d_b(params["d_B"], fake_b)

    # Losses in f32 regardless of compute dtype.
    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    cycled_a, cycled_b = f32(cycled_a), f32(cycled_b)
    same_a, same_b = f32(same_a), f32(same_b)
    disc_fake_a_gen, disc_fake_b_gen = f32(disc_fake_a_gen), f32(disc_fake_b_gen)
    disc_real_a, disc_real_b = f32(disc_real_a), f32(disc_real_b)
    disc_fake_a_d, disc_fake_b_d = f32(disc_fake_a_d), f32(disc_fake_b_d)

    w = loss_weights
    gAB_adv = generator_loss(disc_fake_b_gen, loss_obj, w["generator"])
    gBA_adv = generator_loss(disc_fake_a_gen, loss_obj, w["generator"])
    total_cycle_loss = calc_cycle_loss(real_a, cycled_a, w["cycle"]) + calc_cycle_loss(
        real_b, cycled_b, w["cycle"]
    )
    id_a = identity_loss(real_a, same_a, w["identity"])
    id_b = identity_loss(real_b, same_b, w["identity"])
    total_gAB_loss = gAB_adv + total_cycle_loss + id_b
    total_gBA_loss = gBA_adv + total_cycle_loss + id_a
    da_loss = discriminator_loss(disc_real_a, disc_fake_a_d, loss_obj,
                                 w["discriminator"])
    db_loss = discriminator_loss(disc_real_b, disc_fake_b_d, loss_obj,
                                 w["discriminator"])

    # One scalar whose per-group gradients equal the four reference
    # gradients: the shared cycle term appears once (it already flows to
    # both generators), identities and adversarial terms per-generator.
    surrogate = gAB_adv + gBA_adv + total_cycle_loss + id_a + id_b + da_loss + db_loss

    metrics = dict(
        gAB_loss=total_gAB_loss,
        gBA_loss=total_gBA_loss,
        dA_loss=da_loss,
        dB_loss=db_loss,
        dA_acc=accuracy(disc_real_a, disc_fake_a_d),
        dB_acc=accuracy(disc_real_b, disc_fake_b_d),
    )
    # Batch-norm state updates: generators see two passes per step; keep the
    # last one per network (matching sequential Keras update order).
    new_model_state = dict(
        g_AB=st_gab2 if st_gab2 else st_gab1,
        g_BA=st_gba2 if st_gba2 else st_gba1,
        d_A=st_da2 if st_da2 else st_da1,
        d_B=st_db2 if st_db2 else st_db1,
    )
    return surrogate, metrics, new_model_state


def _pack_scoped(fn: Callable, tpu_layout: bool,
                 pallas_kernels: bool = True) -> Callable:
    """Wrap a to-be-jitted step so the WHOLE trace — including
    custom-VJP backward rules, which JAX traces at transposition time,
    well after ``_forward_losses``' own with-block has exited — runs
    under the kernel-pack scope (ops/packctx.py). Per post-compile call
    this is one no-op context-manager entry."""
    if not tpu_layout:
        return fn
    from cyclegan_tpu.ops import packctx

    @functools.wraps(fn)
    def scoped(*args, **kwargs):
        with packctx.scope(pallas_kernels):
            return fn(*args, **kwargs)

    return scoped


def _spatial_scoped(fn: Callable, spatial_axis: str, n_shards: int) -> Callable:
    """Wrap a shard_map body so the WHOLE trace (incl. transposition-time
    custom-VJP rules, same rationale as :func:`_pack_scoped`) runs under
    the explicit-halo spatial context (ops/spatialctx.py)."""
    from cyclegan_tpu.ops import spatialctx

    @functools.wraps(fn)
    def scoped(*args, **kwargs):
        with spatialctx.spatial(spatial_axis, n_shards):
            return fn(*args, **kwargs)

    return scoped


def _check_spatial_kernel_exclusion(
    spatial_axis: Optional[str], tpu_layout: bool
) -> None:
    """Single validator for the one structural constraint every step
    builder shares: the NHCW Pallas kernel pack cannot run under spatial
    sharding (Pallas custom calls are opaque to the SPMD partitioner —
    parallel/spatial.py scope note)."""
    if spatial_axis is not None and tpu_layout:
        raise ValueError(
            "spatial_axis and tpu_layout are mutually exclusive: Pallas "
            "custom calls are opaque to the SPMD partitioner "
            "(parallel/spatial.py scope note)"
        )


def _batch_shardings(mesh, axis: str, spatial_axis: Optional[str] = None):
    """(replicated, batch-sharded) NamedShardings for the data mesh.

    With ``spatial_axis`` (a 2-D ``(data, spatial)`` mesh from
    ``parallel.spatial.create_spatial_mesh``), activations additionally
    shard their H dim (NHWC dim 1) over that axis — the image analog of
    sequence parallelism; XLA inserts the conv halo exchanges and turns
    instance-norm's (H, W) reductions into psums (parallel/spatial.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    if spatial_axis is None:
        batch = NamedSharding(mesh, P(axis))
    else:
        batch = NamedSharding(mesh, P(axis, spatial_axis))
    return replicated, batch


def _forward_losses_paired(
    params: Dict[str, Any],
    model_state: Dict[str, Any],
    models: Mapping[str, Model],
    loss_obj: Callable,
    loss_weights: Mapping[str, float],
    real_a: jnp.ndarray,
    real_b: jnp.ndarray,
    train: bool,
    rng: Optional[jax.Array],
    stop_grads: bool,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Paired-twin variant of :func:`_forward_losses`.

    g_AB/g_BA (and d_A/d_B) share an architecture, so each *pair* of
    applications runs as ONE ``jax.vmap`` call over stacked params — XLA
    lowers this to grouped convolutions with doubled channels, halving the
    128-lane padding waste that dominates this model family's MXU
    utilization. Identical math to the unpaired path (stacking is linear;
    verified in tests/test_steps.py::test_paired_forward_matches), but
    requires stateless models (instance norm, the default) — the trainer
    falls back to the unpaired path for batch-norm configs.

    The generator dependency chain forces three paired rounds:
      round 1: [g_AB(real_a), g_BA(real_b)] -> [fake_b, fake_a]
      round 2: [g_AB(fake_a), g_BA(fake_b)] -> [cycled_b, cycled_a]
      round 3: [g_AB(real_b), g_BA(real_a)] -> [same_b, same_a]
    and the discriminators two paired calls (real view + fake view, with
    the same stop-gradient structure as the unpaired step).
    """
    sg = jax.lax.stop_gradient if stop_grads else (lambda x: x)
    if compute_dtype != jnp.float32:
        params = _cast_floats(params, compute_dtype)
        real_a_net = real_a.astype(compute_dtype)
        real_b_net = real_b.astype(compute_dtype)
    else:
        real_a_net, real_b_net = real_a, real_b

    stack = lambda t1, t2: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.stack([a, b]), t1, t2
    )
    pg = stack(params["g_AB"], params["g_BA"])
    pd = stack(params["d_A"], params["d_B"])

    g_model, d_model = models["g_AB"], models["d_A"]
    # stateless (instance-norm) models: the state trees carry no arrays but
    # must keep their structure for apply; identical across the twin pair
    g_state = model_state["g_AB"]
    d_state = model_state["d_A"]

    def g_apply(p, x, r):
        y, _ = g_model.apply(p, g_state, x, train=train, rng=r)
        return y

    if remat:
        g_apply = jax.checkpoint(g_apply)

    def d_apply(p, x):
        y, _ = d_model.apply(p, d_state, x, train=train)
        return y

    vg = jax.vmap(g_apply, in_axes=(0, 0, 0 if rng is not None else None))
    vd = jax.vmap(d_apply, in_axes=(0, 0))

    rngs = jax.random.split(rng, 6).reshape(3, 2, -1) if rng is not None \
        else [None] * 3

    r1 = vg(pg, jnp.stack([real_a_net, real_b_net]), rngs[0])
    fake_b, fake_a = r1[0], r1[1]
    r2 = vg(pg, jnp.stack([fake_a, fake_b]), rngs[1])
    cycled_b, cycled_a = r2[0], r2[1]
    r3 = vg(pg, jnp.stack([real_b_net, real_a_net]), rngs[2])
    same_b, same_a = r3[0], r3[1]

    fakes = jnp.stack([fake_a, fake_b])
    d_real = vd(pd, jnp.stack([real_a_net, real_b_net]))
    if stop_grads:
        # Shared-forward dual view (see _dual_disc_views); state aux is
        # an empty tuple — the paired path requires stateless models.
        d_fake_gen, d_fake_d, _ = _dual_disc_views(
            lambda pp, xx: (vd(pp, xx), ()), pd, fakes
        )
    else:
        d_fake_gen = vd(pd, fakes)
        d_fake_d = vd(pd, fakes)
    disc_real_a, disc_real_b = d_real[0], d_real[1]
    disc_fake_a_gen, disc_fake_b_gen = d_fake_gen[0], d_fake_gen[1]
    disc_fake_a_d, disc_fake_b_d = d_fake_d[0], d_fake_d[1]

    f32 = lambda x: x.astype(jnp.float32)  # noqa: E731
    cycled_a, cycled_b = f32(cycled_a), f32(cycled_b)
    same_a, same_b = f32(same_a), f32(same_b)
    disc_fake_a_gen, disc_fake_b_gen = f32(disc_fake_a_gen), f32(disc_fake_b_gen)
    disc_real_a, disc_real_b = f32(disc_real_a), f32(disc_real_b)
    disc_fake_a_d, disc_fake_b_d = f32(disc_fake_a_d), f32(disc_fake_b_d)

    w = loss_weights
    gAB_adv = generator_loss(disc_fake_b_gen, loss_obj, w["generator"])
    gBA_adv = generator_loss(disc_fake_a_gen, loss_obj, w["generator"])
    total_cycle_loss = calc_cycle_loss(real_a, cycled_a, w["cycle"]) + calc_cycle_loss(
        real_b, cycled_b, w["cycle"]
    )
    id_a = identity_loss(real_a, same_a, w["identity"])
    id_b = identity_loss(real_b, same_b, w["identity"])
    total_gAB_loss = gAB_adv + total_cycle_loss + id_b
    total_gBA_loss = gBA_adv + total_cycle_loss + id_a
    da_loss = discriminator_loss(disc_real_a, disc_fake_a_d, loss_obj,
                                 w["discriminator"])
    db_loss = discriminator_loss(disc_real_b, disc_fake_b_d, loss_obj,
                                 w["discriminator"])
    surrogate = gAB_adv + gBA_adv + total_cycle_loss + id_a + id_b + da_loss + db_loss

    metrics = dict(
        gAB_loss=total_gAB_loss,
        gBA_loss=total_gBA_loss,
        dA_loss=da_loss,
        dB_loss=db_loss,
        dA_acc=accuracy(disc_real_a, disc_fake_a_d),
        dB_acc=accuracy(disc_real_b, disc_fake_b_d),
    )
    return surrogate, metrics, model_state


def make_validate_step(
    models: Mapping[str, Model],
    loss_name: str,
    loss_weights: Mapping[str, float],
    preprocess: Optional[Callable] = None,
    mesh=None,
    mesh_axis: str = "data",
    spatial_axis: Optional[str] = None,
    compute_dtype: str = "float32",
    tpu_layout: bool = False,
    fuse_apps: bool = False,
    pallas_kernels: bool = True,
    shard_map_dp: bool = False,
) -> Callable:
    """Build the jitted eval step (reference: validate_step with
    training=False, cyclegan/model.py:91-134, called at :219-223).

    ``preprocess`` (e.g. uint8 -> [-1,1] normalize) runs inside the jit.
    With ``mesh``, inputs are batch-sharded and the state replicated — XLA
    turns the mean-reductions in the losses into psums over ICI.

    ``shard_map_dp=True`` (requires ``mesh``) mirrors the train path's
    explicit ``shard_map`` data parallelism: the body runs on the LOCAL
    per-shard batch and per-shard metric means are pmean'd (equal shards
    -> same global mean as the GSPMD path). With ``dp_shard_map`` on, the
    WHOLE product surface — train and validation — is traced per-shard by
    construction, so no GSPMD decision about opaque Pallas custom calls
    remains anywhere in the run.
    """
    loss_obj = get_loss_obj(loss_name)
    weights = {k: float(v) for k, v in dict(loss_weights).items()}
    cdtype = jnp.dtype(compute_dtype)

    def validate_step(state: TrainState, real_a, real_b, axis_name=None,
                      spatial_name=None):
        if preprocess is not None:
            # eval preprocess is elementwise (normalize only — no resize
            # jitter), so it is correct per H-strip without a gather
            real_a = preprocess(real_a)
            real_b = preprocess(real_b)
        _, metrics, _ = _forward_losses(
            state.params,
            state.model_state,
            models,
            loss_obj,
            weights,
            real_a,
            real_b,
            train=False,
            rng=None,
            stop_grads=False,
            compute_dtype=cdtype,
            tpu_layout=tpu_layout,
            fuse_apps=fuse_apps,
            pallas_kernels=pallas_kernels,
        )
        mean_axes = tuple(n for n in (axis_name, spatial_name)
                          if n is not None)
        if mean_axes:
            metrics = jax.lax.pmean(metrics, mean_axes)
        return metrics

    if shard_map_dp:
        if mesh is None:
            raise ValueError("shard_map_dp requires a mesh")
        from jax.sharding import PartitionSpec as P

        if spatial_axis is not None:
            n_sp = int(mesh.shape[spatial_axis])
            body = _spatial_scoped(
                _pack_scoped(
                    functools.partial(validate_step, axis_name=mesh_axis,
                                      spatial_name=spatial_axis),
                    tpu_layout, pallas_kernels,
                ),
                spatial_axis, n_sp,
            )
            sm = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(mesh_axis, spatial_axis),
                          P(mesh_axis, spatial_axis)),
                out_specs=P(),
                check_vma=False,
            )
            return jax.jit(sm)
        body = _pack_scoped(
            functools.partial(validate_step, axis_name=mesh_axis),
            tpu_layout, pallas_kernels,
        )
        sm = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(mesh_axis), P(mesh_axis)),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sm)
    _check_spatial_kernel_exclusion(spatial_axis, tpu_layout)
    validate_step = _pack_scoped(validate_step, tpu_layout, pallas_kernels)
    if mesh is None:
        return jax.jit(validate_step)
    replicated, batch = _batch_shardings(mesh, mesh_axis, spatial_axis)
    return jax.jit(
        validate_step,
        in_shardings=(replicated, batch, batch),
        out_shardings=replicated,
    )


def make_train_step(
    models: Mapping[str, Model],
    optimizers: Mapping[str, optax.GradientTransformation],
    loss_name: str,
    loss_weights: Mapping[str, float],
    donate: bool = True,
    preprocess: Optional[Callable] = None,
    mesh=None,
    mesh_axis: str = "data",
    spatial_axis: Optional[str] = None,
    compute_dtype: str = "float32",
    remat: bool = False,
    paired: bool = False,
    tpu_layout: bool = False,
    fuse_apps: bool = False,
    pallas_kernels: bool = True,
    shard_map_dp: bool = False,
) -> Callable:
    """Build the jitted train step: one forward set, ONE backward pass,
    four optimizer updates (reference: train_step, cyclegan/model.py:136-154).

    The returned function has signature ``(state, real_a, real_b) ->
    (new_state, metrics)`` and donates ``state`` so parameter buffers are
    updated in place on device.

    ``preprocess(rng, a, b) -> (a, b)`` runs inside the jit before the
    forward set — the trainer passes the normalize+jitter augmentation here
    so the whole pipeline fuses into one XLA program.

    With ``mesh`` (a 1-D ``jax.sharding.Mesh``), the state is replicated
    and the batch sharded along ``mesh_axis``: XLA's SPMD partitioner
    derives the gradient all-reduce (psum over ICI) from the sharding
    annotations — the TPU-native replacement for a NCCL data-parallel loop.

    ``shard_map_dp=True`` (requires ``mesh``) swaps GSPMD's automatic
    partitioning for an explicit ``shard_map`` over ``mesh_axis``: each
    device traces the step on its LOCAL per-shard batch and gradients /
    metrics are pmean'd by hand. Math-identical to the GSPMD path (same
    equal-shard mean decomposition), but the per-device program is built
    at per-shard shapes *by construction* — the insurance path for the
    Pallas kernel pack, whose Mosaic custom calls GSPMD may otherwise
    choose to all-gather-and-replicate rather than partition (GSPMD's
    treatment of opaque custom calls is not contractual; inside
    shard_map there is no partitioner decision left to make). The only
    behavioral difference: per-shard RNG streams are derived by folding
    ``axis_index`` into the step rng, so augmentation/dropout draws
    differ from the single-device sequence (the GSPMD path shards one
    global draw instead).
    """
    loss_obj = get_loss_obj(loss_name)
    weights = {k: float(v) for k, v in dict(loss_weights).items()}
    cdtype = jnp.dtype(compute_dtype)

    def loss_fn(params, model_state, real_a, real_b, rng):
        if paired:
            surrogate, metrics, new_model_state = _forward_losses_paired(
                params,
                model_state,
                models,
                loss_obj,
                weights,
                real_a,
                real_b,
                train=True,
                rng=rng,
                stop_grads=True,
                compute_dtype=cdtype,
                remat=remat,
            )
        else:
            surrogate, metrics, new_model_state = _forward_losses(
                params,
                model_state,
                models,
                loss_obj,
                weights,
                real_a,
                real_b,
                train=True,
                rng=rng,
                stop_grads=True,
                compute_dtype=cdtype,
                remat=remat,
                tpu_layout=tpu_layout,
                fuse_apps=fuse_apps,
                pallas_kernels=pallas_kernels,
            )
        return surrogate, (metrics, new_model_state)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, real_a, real_b, axis_name=None,
                   spatial_name=None):
        rng, step_rng = jax.random.split(state.rng)
        if axis_name is not None:
            # shard_map mode: the body runs once per shard on the local
            # batch — decorrelate the per-shard augmentation/dropout
            # streams (the GSPMD path shards one global draw instead).
            # NOT folded by the spatial index: every H-strip of a sample
            # must draw the SAME augmentation (crop offset, flip).
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(axis_name)
            )
        if preprocess is not None:
            pre_rng, step_rng = jax.random.split(step_rng)
            if spatial_name is not None:
                # The resize-based jitter needs WHOLE images (a strip of
                # a resized image is not the resize of a strip): gather
                # the H axis, augment identically across the spatial
                # group (same pre_rng), slice the local strip back out.
                from cyclegan_tpu.ops import spatialctx

                real_a, real_b = preprocess(
                    pre_rng, spatialctx.gather_h(real_a),
                    spatialctx.gather_h(real_b),
                )
                real_a = spatialctx.slice_local_h(real_a)
                real_b = spatialctx.slice_local_h(real_b)
            else:
                real_a, real_b = preprocess(pre_rng, real_a, real_b)
        if spatial_name is not None:
            # decorrelate per-strip dropout draws (iid elementwise either
            # way; reusing one stream would replicate masks across strips)
            step_rng = jax.random.fold_in(
                step_rng, jax.lax.axis_index(spatial_name)
            )
        grads, (metrics, new_model_state) = grad_fn(
            state.params, state.model_state, real_a, real_b, step_rng
        )
        mean_axes = tuple(n for n in (axis_name, spatial_name)
                          if n is not None)
        if mean_axes:
            # Equal shards: global-mean-loss gradients are the pmean of
            # per-shard local-mean gradients; same for the metric means.
            # (Cross-shard terms are exact: ppermute's transpose already
            # routed halo-row cotangents to the producing shard.)
            grads = jax.lax.pmean(grads, mean_axes)
            metrics = jax.lax.pmean(metrics, mean_axes)
        if paired:  # stateless models; keep existing (empty) state trees
            new_model_state = state.model_state
        new_params = {}
        new_opt_state = {}
        for name in NETWORKS:
            updates, new_opt_state[name] = optimizers[name].update(
                grads[name], state.opt_state[name], state.params[name]
            )
            new_params[name] = optax.apply_updates(state.params[name], updates)
        return (
            TrainState(
                params=new_params,
                model_state=new_model_state,
                opt_state=new_opt_state,
                rng=rng,
                step=state.step + 1,
            ),
            metrics,
        )

    donate_argnums = (0,) if donate else ()
    if shard_map_dp:
        if mesh is None:
            raise ValueError("shard_map_dp requires a mesh")
        from jax.sharding import PartitionSpec as P

        if spatial_axis is not None:
            # Explicit (data x spatial) shard_map: batches H-shard by
            # construction, convs exchange halos via ops/spatialctx.py,
            # instance-norm stats psum — so the NHCW Pallas kernel pack
            # runs under spatial sharding (no GSPMD decision about the
            # Mosaic custom calls anywhere). This lifts the GSPMD path's
            # spatial x tpu_layout exclusion.
            n_sp = int(mesh.shape[spatial_axis])
            body = _spatial_scoped(
                _pack_scoped(
                    functools.partial(train_step, axis_name=mesh_axis,
                                      spatial_name=spatial_axis),
                    tpu_layout, pallas_kernels,
                ),
                spatial_axis, n_sp,
            )
            sm = jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(mesh_axis, spatial_axis),
                          P(mesh_axis, spatial_axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return jax.jit(sm, donate_argnums=donate_argnums)
        body = _pack_scoped(
            functools.partial(train_step, axis_name=mesh_axis),
            tpu_layout, pallas_kernels,
        )
        sm = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(mesh_axis), P(mesh_axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sm, donate_argnums=donate_argnums)
    _check_spatial_kernel_exclusion(spatial_axis, tpu_layout)
    train_step = _pack_scoped(train_step, tpu_layout, pallas_kernels)
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)
    replicated, batch = _batch_shardings(mesh, mesh_axis, spatial_axis)
    return jax.jit(
        train_step,
        donate_argnums=donate_argnums,
        in_shardings=(replicated, batch, batch),
        out_shardings=(replicated, replicated),
    )


def make_train_multi_step(
    models: Mapping[str, Model],
    optimizers: Mapping[str, optax.GradientTransformation],
    loss_name: str,
    loss_weights: Mapping[str, float],
    donate: bool = True,
    preprocess: Optional[Callable] = None,
    mesh=None,
    mesh_axis: str = "data",
    spatial_axis: Optional[str] = None,
    compute_dtype: str = "float32",
    remat: bool = False,
    paired: bool = False,
    tpu_layout: bool = False,
    fuse_apps: bool = False,
    pallas_kernels: bool = True,
    shard_map_dp: bool = False,
) -> Callable:
    """Build a jitted K-step trainer: ``(state, real_a, real_b) ->
    (state, stacked_metrics)`` where the batch leading dim is the step
    axis, i.e. inputs are ``(K, B, H, W, C)``, executed with ``lax.scan``.

    One dispatch runs K optimizer steps entirely on device — this
    amortizes host round-trips (dominant on remote/tunneled TPUs) and
    per-call overheads; the per-step math is byte-identical to
    :func:`make_train_step` (it scans the same body).

    ``shard_map_dp=True`` (requires ``mesh``) moves the ``lax.scan``
    INSIDE a ``shard_map`` over ``mesh_axis``: each device scans K steps
    over its local batch shards, pmean-ing gradients/metrics per step —
    so host-round-trip amortization and the Pallas-safe explicit-DP path
    compose (the two knobs were mutually exclusive through round 3).
    Per-step math identical to ``make_train_step(shard_map_dp=True)``:
    the scanned body is the same function, axis_name and all.
    """
    single = make_train_step(
        models, optimizers, loss_name, loss_weights,
        donate=False, preprocess=preprocess, mesh=None,
        compute_dtype=compute_dtype, remat=remat, paired=paired,
        tpu_layout=tpu_layout, fuse_apps=fuse_apps,
        pallas_kernels=pallas_kernels,
    )
    # un-jitted body: reuse the single-step computation inside the scan
    inner = single.__wrapped__

    def multi_step(state: TrainState, real_a, real_b, axis_name=None,
                   spatial_name=None):
        def body(carry, ab):
            new_state, metrics = inner(carry, ab[0], ab[1],
                                       axis_name=axis_name,
                                       spatial_name=spatial_name)
            return new_state, metrics

        return jax.lax.scan(body, state, (real_a, real_b))

    donate_argnums = (0,) if donate else ()
    if shard_map_dp:
        if mesh is None:
            raise ValueError("shard_map_dp requires a mesh")
        from jax.sharding import PartitionSpec as P

        # inner is already pack-scoped per call (single.__wrapped__), so
        # the scan body re-enters the scope exactly like the single-step
        # shard_map path does.
        if spatial_axis is not None:
            n_sp = int(mesh.shape[spatial_axis])
            sm_body = _spatial_scoped(
                functools.partial(multi_step, axis_name=mesh_axis,
                                  spatial_name=spatial_axis),
                spatial_axis, n_sp,
            )
            sm = jax.shard_map(
                sm_body,
                mesh=mesh,
                in_specs=(P(), P(None, mesh_axis, spatial_axis),
                          P(None, mesh_axis, spatial_axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return jax.jit(sm, donate_argnums=donate_argnums)
        sm_body = functools.partial(multi_step, axis_name=mesh_axis)
        sm = jax.shard_map(
            sm_body,
            mesh=mesh,
            in_specs=(P(), P(None, mesh_axis), P(None, mesh_axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sm, donate_argnums=donate_argnums)
    _check_spatial_kernel_exclusion(spatial_axis, tpu_layout)
    if mesh is None:
        return jax.jit(multi_step, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    # (K, B, H, ...): shard B over the data axis, H over spatial if given
    batch = NamedSharding(mesh, P(None, mesh_axis, spatial_axis))
    return jax.jit(
        multi_step,
        donate_argnums=donate_argnums,
        in_shardings=(replicated, batch, batch),
        out_shardings=(replicated, replicated),
    )


def reference_gradients(
    models: Mapping[str, Model],
    loss_name: str,
    loss_weights: Mapping[str, float],
    params: Dict[str, Any],
    model_state: Dict[str, Any],
    real_a: jnp.ndarray,
    real_b: jnp.ndarray,
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Naive 4-backward-pass gradients, exactly as the reference's four
    ``tape.gradient`` calls compute them (cyclegan/model.py:143-147).

    Used by the test-suite to verify the single-backward surrogate.
    """
    loss_obj = get_loss_obj(loss_name)
    weights = {k: float(v) for k, v in dict(loss_weights).items()}

    def metrics_for(p):
        _, metrics, _ = _forward_losses(
            p, model_state, models, loss_obj, weights, real_a, real_b,
            train=True, rng=rng, stop_grads=False,
        )
        return metrics

    grads: Dict[str, Any] = {}
    for name, metric in (
        ("g_AB", "gAB_loss"),
        ("g_BA", "gBA_loss"),
        ("d_A", "dA_loss"),
        ("d_B", "dB_loss"),
    ):

        def scoped_loss(group_params, name=name, metric=metric):
            p = dict(params)
            p[name] = group_params
            return metrics_for(p)[metric]

        grads[name] = jax.grad(scoped_loss)(params[name])
    return grads
