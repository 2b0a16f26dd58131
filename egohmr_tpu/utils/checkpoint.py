"""Checkpoint save/restore with resume support (orbax).

The reference only ever saves `state_dict` snapshots and has NO resume logic
(SURVEY.md §5; reference train_egohmr.py:215-234). Here a checkpoint bundles
params + optimizer state + step + normalization stats, and training can
resume exactly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """state: arbitrary pytree (params/opt_state/step/stats...)."""
    path = os.path.abspath(path)
    ckptr = _ckptr()
    ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """Restore a checkpoint saved by `save_checkpoint`.

    `template` (same-structure pytree) restores with matching shardings and
    dtypes; without it, arrays come back as numpy.
    """
    path = os.path.abspath(path)
    ckptr = _ckptr()
    if template is None:
        return ckptr.restore(path)
    import orbax.checkpoint as ocp

    return ckptr.restore(path, item=template)


def latest_checkpoint(ckpt_dir: str, prefix: str = "step_") -> Optional[str]:
    """Find the newest step checkpoint under `ckpt_dir`."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith(prefix):
            try:
                steps.append((int(name[len(prefix):]), name))
            except ValueError:
                continue
    if not steps:
        return None
    steps.sort()
    return os.path.join(ckpt_dir, steps[-1][1])


def save_npz(path: str, tree: Any) -> None:
    """Flat .npz fallback (portable, torch-free interchange)."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            if node and all(isinstance(k, str) and k.isdigit()
                            for k in node):
                # indistinguishable from a flattened list on reload:
                # load_npz_tree would coerce this level into a list,
                # silently changing the pytree structure. Refuse here.
                raise ValueError(
                    f"save_npz: dict at {prefix!r} is keyed entirely by "
                    "digit strings — ambiguous with list flattening; "
                    "rename the keys or use a list")
            for k, v in node.items():
                walk(v, f"{prefix}{k}.")
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{prefix}{i}.")
        else:
            flat[prefix[:-1]] = np.asarray(node)

    walk(tree, "")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_npz_tree(path: str) -> Any:
    """Reconstruct the nested pytree from a flat .npz written by `save_npz`
    WITHOUT a template: dotted segments become dict keys, and a level whose
    keys are exactly the integers 0..n-1 becomes a list (matching how
    save_npz flattens lists). Needed when the structure can't be rebuilt
    from an init fn — e.g. converted `per_part_networks` collision nets
    (collision.neural_sdf.load_sdfnet / neural_occupancy.load_occupancy),
    whose layout exists only in the converted release, not in init_*."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}

    root: Dict[str, Any] = {}
    for key, val in flat.items():
        node = root
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def convert(node):
        if not isinstance(node, dict):
            import jax.numpy as jnp

            return jnp.asarray(node)
        out = {k: convert(v) for k, v in node.items()}
        if out and all(k.isdigit() for k in out):
            idx = sorted(int(k) for k in out)
            if idx == list(range(len(idx))):
                return [out[str(i)] for i in idx]
        return out

    return convert(root)


def load_npz_into(path: str, template: Any) -> Any:
    """Load a flat .npz (from save_npz) back into `template`'s structure."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}{k}.") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(
                walk(v, f"{prefix}{i}.") for i, v in enumerate(node))
        import jax.numpy as jnp

        return jnp.asarray(flat[prefix[:-1]])

    return walk(template, "")
