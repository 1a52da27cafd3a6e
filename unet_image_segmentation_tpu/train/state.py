"""Train state: params + BN stats + AdamW optimizer with mutable LR.

Rebuilds the reference's compile step (``scripts/train.py:223-234``:
AdamW(lr, weight_decay) + dice loss) the JAX way.  The learning rate is
injected as a hyperparameter (``optax.inject_hyperparams``) so the
ReduceLROnPlateau callback can lower it between epochs without
recompiling the train step — the optax analog of Keras mutating
``optimizer.learning_rate`` (reference ``train.py:290-297``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unet_image_segmentation_tpu.config import Config
from unet_image_segmentation_tpu.models.unet import UNet, build_unet


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array  # base dropout key; folded with step per train step
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @property
    def learning_rate(self) -> jax.Array:
        return self.opt_state.hyperparams["learning_rate"]

    def set_learning_rate(self, lr: float) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state = self.opt_state._replace(hyperparams=hp)
        return self.replace(opt_state=opt_state)


def make_optimizer(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """AdamW with Keras-default betas/eps and decoupled weight decay.

    Keras AdamW decays *all* trainable variables unless told otherwise;
    optax.adamw with no mask matches that (reference train.py:226-227).
    """
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-7,  # Keras epsilon default for Adam/AdamW
        weight_decay=weight_decay,
    )


def make_root_key(cfg: Config) -> jax.Array:
    """Seeded root key honoring ``cfg.train.rng_impl``.

    Uses a typed key (``jax.random.key``) so the PRNG implementation (e.g.
    the fast non-cryptographic 'rbg' used for dropout masks) travels WITH
    the key through fold_in/split, instead of leaking through the
    process-global ``jax_default_prng_impl`` config — mutating that global
    from ``fit()`` changed RNG behavior for unrelated code in the same
    process.
    """
    if cfg.train.rng_impl:
        return jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)
    return jax.random.PRNGKey(cfg.train.seed)


def create_train_state(
    cfg: Config,
    rng: Optional[jax.Array] = None,
    model: Optional[UNet] = None,
) -> TrainState:
    if rng is None:
        rng = make_root_key(cfg)
    if model is None:
        model = build_unet(cfg.model)
    params_rng, dropout_rng = jax.random.split(rng)
    dummy = jnp.zeros((1, *cfg.model.input_shape), jnp.float32)
    variables = model.init({"params": params_rng}, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=dropout_rng,
        tx=tx,
        apply_fn=model.apply,
    )


def state_from_variables(
    cfg: Config, variables: dict, model: Optional[UNet] = None
) -> TrainState:
    """Build a TrainState around imported variables (e.g. a Keras .h5)."""
    if model is None:
        model = build_unet(cfg.model)
    tx = make_optimizer(cfg.train.learning_rate, cfg.train.weight_decay)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        rng=make_root_key(cfg),
        tx=tx,
        apply_fn=model.apply,
    )
