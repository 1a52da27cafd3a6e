"""Orbax-backed checkpointing with best-model policy and true resume.

Replaces the reference's ``ModelCheckpoint`` single ``.h5`` best-only file
(reference ``scripts/train.py:273-280``) with sharded Orbax checkpoints,
and adds the capability the reference lacks (SURVEY.md §5): mid-run resume
restoring params + optimizer state + BN stats + step + PRNG + callback
bookkeeping.

Layout under ``model_out`` (a directory):

* ``best/``  — weights of the best ``monitor`` epoch (what inference loads)
* ``last/``  — rolling full state for resume
* ``meta.json`` — monitor name/mode, best score, epoch, LR, wait counters
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _is_typed_key(x) -> bool:
    return jax.numpy.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key)


def _state_tree(state) -> Dict[str, Any]:
    # typed PRNG keys (extended dtype) serialize as their raw uint32 data;
    # the impl is re-attached on restore from the template's key.
    rng = state.rng
    if _is_typed_key(rng):
        rng = jax.random.key_data(rng)
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "rng": rng,
    }


def save_state(path: str, state, meta: Optional[Dict[str, Any]] = None) -> None:
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    tree = jax.device_get(_state_tree(state))
    ckpt.save(path, tree, force=True)
    if meta is not None:
        with open(os.path.join(os.path.dirname(path), "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)


def restore_state(path: str, template_state):
    """Restore into the structure of ``template_state`` (shapes must match)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    target = jax.device_get(_state_tree(template_state))
    tree = ckpt.restore(path, item=target)
    rng = jax.numpy.asarray(tree["rng"])
    if _is_typed_key(template_state.rng):
        rng = jax.random.wrap_key_data(
            rng, impl=jax.random.key_impl(template_state.rng)
        )
    return template_state.replace(
        step=jax.numpy.asarray(tree["step"]),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        rng=rng,
    )


def save_inference_variables(path: str, params, batch_stats=None, model_kwargs=None) -> None:
    """Save only what inference needs (the 'best' artifact)."""
    path = os.path.abspath(path)
    tree = {"params": jax.device_get(params)}
    if batch_stats is not None:
        tree["batch_stats"] = jax.device_get(batch_stats)
    _checkpointer().save(path, tree, force=True)
    if model_kwargs is not None:
        with open(os.path.join(path + ".model.json"), "w") as f:
            json.dump(model_kwargs, f, indent=2, default=str)


def load_inference_variables(path: str) -> Tuple[Dict[str, Any], Optional[dict]]:
    """Load inference variables + model kwargs. Accepts:

    * an Orbax directory written by :func:`save_inference_variables`
      (or its parent containing ``best/``),
    * a Keras ``.h5`` file from the reference stack (imported via
      :mod:`..utils.keras_import`).
    """
    path = os.path.abspath(path)
    if path.endswith(".h5") or path.endswith(".keras"):
        from unet_image_segmentation_tpu.utils.keras_import import load_keras_h5

        return load_keras_h5(path)
    if os.path.isdir(os.path.join(path, "best")):
        path = os.path.join(path, "best")
    variables = _checkpointer().restore(path)
    kwargs = None
    kw_path = path + ".model.json"
    if os.path.exists(kw_path):
        with open(kw_path) as f:
            kwargs = json.load(f)
        if "filters" in kwargs:
            kwargs["filters"] = tuple(kwargs["filters"])
    variables = {
        k: v for k, v in variables.items() if k in ("params", "batch_stats")
    }
    return variables, kwargs


def read_meta(model_out: str) -> Optional[Dict[str, Any]]:
    p = os.path.join(os.path.abspath(model_out), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def to_host(tree):
    """Deep copy a pytree to host numpy (safe across donated buffers)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)
