"""Coarse train-step decomposition via marginal chained timing.

Per-op profiling is unreliable through the TPU tunnel (see BASELINE.md
methodology), but ms-scale sub-computations time cleanly: one generator
forward, one discriminator forward, the full forward set (validate step),
and the full train step. The differences localize where the 235 ms go.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.config import yaml2namespace
from cyclegan_tpu.models import create_model
from cyclegan_tpu.optimizers import get_optimizer
from cyclegan_tpu.steps import (
    init_train_state,
    make_train_step,
    make_validate_step,
)

BATCH, SIZE = 8, 256
DTYPE = jnp.bfloat16


def marginal_chain(fn, x, iters=20, warm=4):
    def chain(n):
        start = time.perf_counter()
        y = x
        out = None
        for _ in range(n):
            out = fn(y)
            if isinstance(out, jnp.ndarray) and out.shape == x.shape:
                y = out
        leaf = out if isinstance(out, jnp.ndarray) else \
            jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(leaf.astype(jnp.float32)))
        return time.perf_counter() - start

    chain(warm)
    return (chain(warm + iters) - chain(warm)) / iters


def main():
    tpu_layout = "--nhcw" in sys.argv
    if "--pallas-conv" in sys.argv:
        from cyclegan_tpu.ops import pallas_conv

        pallas_conv.enable(True)
    model_config = yaml2namespace("configs/cycle.yaml")
    train_config = yaml2namespace("configs/training_config.yaml")
    models = {
        "g_AB": create_model(model_config.generator),
        "g_BA": create_model(model_config.generator),
        "d_A": create_model(model_config.discriminator),
        "d_B": create_model(model_config.discriminator),
    }
    optimizers = {
        k: get_optimizer(train_config.g_opt if k.startswith("g") else
                         train_config.d_opt)
        for k in models
    }
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 3))
                    ).astype(DTYPE)

    gp = jax.tree_util.tree_map(lambda v: v.astype(DTYPE), state.params["g_AB"])
    dp = jax.tree_util.tree_map(lambda v: v.astype(DTYPE), state.params["d_A"])
    gs, ds = state.model_state["g_AB"], state.model_state["d_A"]

    from cyclegan_tpu.ops import layout as _layout

    def _scoped(apply_fn, p, s):
        def fn(x):
            if not tpu_layout:
                return apply_fn(p, s, x)[0]
            with _layout.nhcw():
                return _layout.from_nhcw(
                    apply_fn(p, s, _layout.to_nhcw(x))[0]
                )
        return jax.jit(fn)

    g_fwd = _scoped(models["g_AB"].apply, gp, gs)
    _d_raw = _scoped(models["d_A"].apply, dp, ds)
    d_fwd = jax.jit(lambda x: _d_raw(x) * 0 + x)

    t_g = marginal_chain(g_fwd, x)
    t_d = marginal_chain(d_fwd, x)
    print(f"1x generator fwd:     {t_g*1e3:7.2f} ms")
    print(f"1x discriminator fwd: {t_d*1e3:7.2f} ms")
    print(f"  -> forward set estimate (6G+4D): {(6*t_g + 4*t_d)*1e3:7.2f} ms")

    validate = make_validate_step(models, model_config.loss,
                                  dict(model_config.loss_weights),
                                  compute_dtype="bfloat16",
                                  tpu_layout=tpu_layout)
    train = make_train_step(models, optimizers, model_config.loss,
                            dict(model_config.loss_weights), donate=False,
                            compute_dtype="bfloat16",
                            tpu_layout=tpu_layout)

    def time_pair(step_fn, iters=15, warm=3):
        def chain(n):
            start = time.perf_counter()
            s, out = state, None
            for _ in range(n):
                out = step_fn(s, x, x)
                if isinstance(out, tuple):
                    s, out = out
            _ = float(out["gAB_loss"])
            return time.perf_counter() - start

        chain(warm)
        return (chain(warm + iters) - chain(warm)) / iters

    t_val = time_pair(validate)
    t_train = time_pair(train)
    print(f"validate step (fwd set + losses): {t_val*1e3:7.2f} ms")
    print(f"train step (fwd + bwd + 4 opts):  {t_train*1e3:7.2f} ms")
    print(f"  -> backward + optimizers: {(t_train - t_val)*1e3:7.2f} ms "
          f"({(t_train - t_val)/t_val:.2f}x the forward)")


if __name__ == "__main__":
    main()
