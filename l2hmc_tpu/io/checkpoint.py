"""Checkpoint / resume via orbax (reference: tf.train.Saver usage,
mnist_vae.py:290,334; eval restore eval_vae.py:66-69, eval_sampler.py:164-166).

The reference's checkpoints could not reconstruct the sampler's random masks
— eval_sampler.py:52-59 had to scrape them from the saved graph by tensor
name. Here everything needed to rebuild the sampler is explicit state:
{params, opt_state, chain state, step, PRNG key} plus the config (with its
``mask_seed``) serialized alongside as JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAS_ORBAX = False


def _is_typed_key(x) -> bool:
    return isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    )


def _unwrap_keys(tree: Any) -> Any:
    """Typed PRNG keys -> raw uint32 key data (serializable)."""
    return jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x) if _is_typed_key(x) else x, tree
    )


def _rewrap_keys(tree: Any, template: Any) -> Any:
    """Restore typed PRNG keys where the template has them."""
    return jax.tree_util.tree_map(
        lambda restored, tmpl: (
            jax.random.wrap_key_data(jax.numpy.asarray(restored))
            if _is_typed_key(tmpl)
            else restored
        ),
        tree,
        template,
    )


def save_checkpoint(path: str, state: Any, config: Any = None) -> None:
    """Save a pytree state (e.g. TrainState) + optional dataclass config.

    Typed PRNG keys are stored as raw key data and re-wrapped on restore.
    """
    state = _unwrap_keys(state)
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    else:  # minimal fallback
        flat, treedef = jax.tree_util.tree_flatten(jax.device_get(state))
        np.savez(path + ".npz", *[np.asarray(leaf) for leaf in flat])
    if config is not None:
        cfg = (
            dataclasses.asdict(config)
            if dataclasses.is_dataclass(config)
            else dict(config)
        )
        with open(path + ".config.json", "w") as f:
            json.dump(cfg, f, indent=2, default=str)


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    pytree with the right shapes/dtypes)."""
    path = os.path.abspath(path)
    stripped = _unwrap_keys(target)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, target=jax.device_get(stripped))
    else:
        flat, treedef = jax.tree_util.tree_flatten(stripped)
        data = np.load(path + ".npz")
        leaves = [data[k] for k in data.files]
        restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return _rewrap_keys(restored, target)


def load_config(path: str) -> Optional[dict]:
    cfg_path = os.path.abspath(path) + ".config.json"
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        return json.load(f)


def config_from_dict(cls, d: dict):
    """Rebuild a dataclass config from its JSON dict (save_checkpoint's
    sidecar). Unknown keys are ignored (forward compatibility); values are
    coerced through the field default's type, since JSON round-trips e.g.
    tuples as lists and ``default=str`` stringifies exotic values.

    This is the restore half of the mask-seed design (SURVEY.md §2 quirks):
    config + mask_seed fully reconstruct the sampler, replacing the
    reference's scrape-masks-from-the-graph hack (eval_sampler.py:52-59).
    """
    base = cls()
    fields = {f.name for f in dataclasses.fields(cls)}
    overrides = {}
    for k, v in d.items():
        if k not in fields or v is None:
            continue
        current = getattr(base, k)
        if isinstance(current, bool):
            overrides[k] = v if isinstance(v, bool) else str(v).lower() in (
                "1", "true", "yes"
            )
        elif isinstance(current, tuple):
            overrides[k] = tuple(v)
        elif current is not None:
            overrides[k] = type(current)(v)
        else:
            overrides[k] = v
    return dataclasses.replace(base, **overrides)
