"""Native checkpoint save/load for converted parameter pytrees (orbax).

Converting the multi-GB HF torch checkpoints (weights/convert.py) is a
one-time cost; this module persists the resulting pytrees in orbax format
so subsequent runs restore directly to (optionally sharded) jax arrays —
the framework-native analogue of the reference's `from_pretrained` flow
(SURVEY.md §5 checkpoint row).
"""

from __future__ import annotations

from pathlib import Path

import jax


def save(path: str, tree) -> None:
    import orbax.checkpoint as ocp
    p = Path(path).absolute()
    p.parent.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(p, tree, force=True)
    ckpt.wait_until_finished()


def load(path: str, like=None, sharding=None):
    """Restore a pytree.  `like`: optional abstract pytree (shapes/dtypes)
    to restore into; `sharding`: optional matching NamedSharding pytree so
    large models restore directly sharded across the mesh."""
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    p = Path(path).absolute()
    if like is None:
        return ckpt.restore(p)
    abstract = jax.tree.map(
        lambda x, s=None: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=s), like,
        *( [sharding] if sharding is not None else [] ))
    return ckpt.restore(p, abstract)
