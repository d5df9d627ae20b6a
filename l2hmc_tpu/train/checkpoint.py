"""Checkpoint / resume — single-pytree, multi-host aware.

The reference keeps three overlapping mechanisms (SURVEY §5.4): TF Saver
checkpoints, pickled python state, and Keras h5 weights
(``gauge_model.py:429-556``).  Here there is ONE source of truth: an Orbax
checkpoint of the full train-state pytree {params, opt_state, chain state,
step} plus a JSON sidecar for the static config.  Restore rebuilds exactly
the state the step function consumes — resume is bit-exact.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str | Path, state, step: int, config=None, keep: int = 3):
    """Write checkpoint at ``step``; prune to the newest ``keep``
    (reference ``max_to_keep=3``, ``gauge_model.py:506``)."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if config is not None and jax.process_index() == 0:
        cfg_file = ckpt_dir / "config.json"
        if not cfg_file.exists():
            cfg_file.write_text(json.dumps(dataclasses.asdict(config), indent=2))
    with ocp.CheckpointManager(
        ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str | Path) -> Optional[int]:
    ckpt_dir = Path(ckpt_dir).absolute()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str | Path, template, step: Optional[int] = None):
    """Restore into the structure of ``template`` (an abstract or concrete
    train-state pytree).  Returns the restored state."""
    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


def load_config_dict(ckpt_dir: str | Path) -> Optional[dict]:
    f = Path(ckpt_dir).absolute() / "config.json"
    return json.loads(f.read_text()) if f.exists() else None
