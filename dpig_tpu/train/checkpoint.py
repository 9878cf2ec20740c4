"""Checkpointing (orbax) with partial sub-tree composition.

The reference composes 4 independently-trained subnets at inference via
scope-keyed partial savers (trainer.py:180-213, tester.py:259-309):
  {Encoder, ID_AE}           <- --pretrained_path
  {PoseAE}                   <- --pretrained_poseAE_path
  {Gaussian_FC_Fg/Bg}        <- --pretrained_appSample_path
  {PoseGaussian}             <- --pretrained_poseSample_path
Here each named sub-tree of `g_params`/`d_params` is saved as its own
orbax item, so the same composition is a dict merge of restores.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(model_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(model_dir), "ckpt", f"step_{step:08d}")


def save_checkpoint(model_dir: str, step: int, state) -> str:
    """Save g/d params, opt states, d_stats and step under one directory."""
    path = _ckpt_dir(model_dir, step)
    tree = {
        "step": np.asarray(state.step),
        "g_params": state.g_params,
        "d_params": state.d_params,
        "g_opt_state": state.g_opt_state,
        "d_opt_state": state.d_opt_state,
        "d_stats": state.d_stats,
        "frozen_params": state.frozen_params,
    }
    tree = {k: v for k, v in tree.items() if v is not None}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def latest_checkpoint(model_dir: str) -> Optional[str]:
    root = os.path.join(os.path.abspath(model_dir), "ckpt")
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None


def resolve_checkpoint(path: str) -> str:
    """Accept either a checkpoint step directory or a model_dir.

    The reference's --pretrained_* flags take a model DIRECTORY and
    resolve the newest checkpoint inside it (tf.train.latest_checkpoint,
    trainer.py restore path); mirror that: a path that is not itself an
    orbax checkpoint but contains ckpt/step_* resolves to the newest
    step.
    """
    path = os.path.abspath(path)
    if not os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA")):
        latest = latest_checkpoint(path)
        if latest is not None:
            return latest
    return path


def restore_tree(path: str, template=None) -> Dict[str, Any]:
    """Restore a checkpoint directory (a step dir, or a model_dir — see
    `resolve_checkpoint`).

    With `template`, the stored arrays are re-threaded onto the template's
    pytree structure (required for optax states: orbax stores namedtuples
    as plain dicts and optax needs them back as namedtuples).
    """
    path = resolve_checkpoint(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        return ckptr.restore(path, item=template)


def restore_into_state(path: str, state):
    """Full resume: params + opt states + step (reference --ckpt_path)."""
    template = {
        "step": jax.numpy.asarray(state.step),
        "g_params": state.g_params,
        "g_opt_state": state.g_opt_state,
    }
    if state.d_params is not None:
        template["d_params"] = state.d_params
        template["d_opt_state"] = state.d_opt_state
    if state.d_stats is not None:
        template["d_stats"] = state.d_stats
    if state.frozen_params is not None:
        template["frozen_params"] = state.frozen_params
    tree = restore_tree(path, template=template)
    kw = dict(
        step=jax.numpy.asarray(tree["step"]),
        g_params=tree["g_params"],
        g_opt_state=tree.get("g_opt_state", state.g_opt_state),
    )
    if state.d_params is not None and "d_params" in tree:
        kw["d_params"] = tree["d_params"]
        kw["d_opt_state"] = tree.get("d_opt_state", state.d_opt_state)
    if tree.get("d_stats") is not None:
        kw["d_stats"] = tree["d_stats"]
    if tree.get("frozen_params") is not None:
        kw["frozen_params"] = tree["frozen_params"]
    return state.replace(**kw)


def restore_subtrees(path: str, names: Iterable[str]) -> Dict[str, Any]:
    """Pick named sub-trees out of a checkpoint's trained g_params.

    E.g. restore_subtrees(stage1_ckpt, ['Encoder', 'ID_AE']) — the partial
    saver equivalent. Sub-trees a checkpoint trained live in g_params;
    frozen pass-throughs it carried live in frozen_params.
    """
    tree = restore_tree(path)
    out: Dict[str, Any] = {}
    g = tree.get("g_params", {}) or {}
    frozen = tree.get("frozen_params", {}) or {}
    d = tree.get("d_params", {}) or {}
    for name in names:
        if name in g:
            out[name] = g[name]
        elif name in frozen:
            out[name] = frozen[name]
        elif name in d:
            out[name] = d[name]
        else:
            raise KeyError(
                f"sub-tree {name!r} not in checkpoint {path} "
                f"(has g={list(g)}, frozen={list(frozen)}, d={list(d)})")
    return out


def compose_pretrained(cfg) -> Dict[str, Any]:
    """Merge the 4 pretrained-path flags into one named-subtree dict
    (restore order mirrors trainer.py:205-213: parts first)."""
    merged: Dict[str, Any] = {}
    if cfg.pretrained_path:
        merged.update(restore_subtrees(cfg.pretrained_path,
                                       ["Encoder", "ID_AE"]))
    if cfg.pretrained_poseAE_path:
        merged.update(restore_subtrees(cfg.pretrained_poseAE_path, ["PoseAE"]))
    if cfg.pretrained_appSample_path:
        try:
            merged.update(restore_subtrees(cfg.pretrained_appSample_path,
                                           ["Gaussian_FC_Fg", "Gaussian_FC_Bg"]))
        except KeyError:  # DF single-mapper checkpoints (model 103)
            merged.update(restore_subtrees(cfg.pretrained_appSample_path,
                                           ["Gaussian_FC"]))
    if cfg.pretrained_poseSample_path:
        merged.update(restore_subtrees(cfg.pretrained_poseSample_path,
                                       ["PoseGaussian"]))
    return merged
