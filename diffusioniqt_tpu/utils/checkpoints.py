"""Model-level checkpoint utilities (reference ``utils.py:15-61`` and the
Unet persistence methods, imagen_pytorch3D.py:1504-1536).

A persisted model bundle is an orbax directory holding:
  * ``config``   — the wrapper type + constructor kwargs (JSON-able dict)
  * ``params``   — parameter pytrees per unet
  * ``ema``      — optional EMA parameter pytrees

``load_imagen_from_checkpoint`` reconstructs the right wrapper class from
``imagen_type``/``imagen_params``, optionally swapping in EMA weights —
the reference's exact contract."""

from __future__ import annotations

import json
import os
from typing import Any, List, Optional, Tuple

import numpy as np


def save_imagen_checkpoint(path: str, imagen, params: List[Any],
                           ema_params: Optional[List[Any]] = None,
                           extra_config: Optional[dict] = None):
    """Persist an Imagen/ElucidatedImagen + params (+EMA) bundle."""
    import orbax.checkpoint as ocp

    from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    meta = {
        "imagen_type": (
            "elucidated" if isinstance(imagen, ElucidatedImagen) else "original"
        ),
        "num_unets": imagen.num_unets,
        "image_sizes": list(imagen.image_sizes),
        "channels": imagen.channels,
        "extra": extra_config or {},
    }
    with open(os.path.join(path, "imagen_meta.json"), "w") as fh:
        json.dump(meta, fh)
    tree = {"params": params}
    if ema_params is not None:
        tree["ema"] = ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), tree)


def load_imagen_checkpoint(path: str, imagen,
                           load_ema_if_available: bool = False
                           ) -> Tuple[List[Any], Optional[List[Any]]]:
    """Restore (params, ema_params) for a pre-built wrapper. With
    ``load_ema_if_available`` the EMA weights are swapped into the main
    params (reference ``load_imagen_from_checkpoint`` EMA swap,
    utils.py:45-59)."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    meta_path = os.path.join(path, "imagen_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        from diffusioniqt_tpu.diffusion.elucidated import ElucidatedImagen

        want = "elucidated" if isinstance(imagen, ElucidatedImagen) else "original"
        assert meta["imagen_type"] == want, (
            f"checkpoint holds a {meta['imagen_type']} imagen, "
            f"got a {want} wrapper"
        )

    template = {"params": imagen.init_params(jax.random.PRNGKey(0))}
    ema_template = None
    with ocp.PyTreeCheckpointer() as ckptr:
        state_path = os.path.join(path, "state")
        try:
            restored = ckptr.restore(
                state_path,
                item={**template, "ema": template["params"]},
            )
            ema_template = restored.get("ema")
        except Exception:
            restored = ckptr.restore(state_path, item=template)
    params = restored["params"]
    if load_ema_if_available and ema_template is not None:
        params = ema_template
    return params, ema_template


def restore_parts(target_tree, source_tree):
    """Partial state restore: copy leaves whose path+shape match, keep the
    target's leaf otherwise (reference ``restore_parts``,
    trainer.py:222-233)."""
    import jax

    flat_src = dict(jax.tree_util.tree_flatten_with_path(source_tree)[0])
    out_leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(target_tree)[0]:
        src = flat_src.get(path)
        if src is not None and np.shape(src) == np.shape(leaf):
            out_leaves.append(src)
        else:
            out_leaves.append(leaf)
    treedef = jax.tree_util.tree_structure(target_tree)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
