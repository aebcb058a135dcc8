"""Checkpointing backends.

The reference pickles {model state, best plans, iteration} every
save_model_interval iterations plus reward-stamped best copies (reference:
urban_planning/agents/urban_planning_agent.py:172-194). This module keeps
that pickle format (the agents use it directly) and adds an orbax-backed
variant for pure-array training state (TPU trainer checkpoints), which is
the JAX-ecosystem-native format for sharded/async checkpointing.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax


def save_pickle_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        pickle.dump(jax.device_get(payload), f)


def load_pickle_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return pickle.load(f)


def orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except ImportError:
        return False


def save_orbax_checkpoint(directory: str, step: int, tree) -> bool:
    """Save a pure-array pytree with orbax; returns False if orbax missing."""
    if not orbax_available():
        return False
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(directory, f'orbax_{step:06d}'))
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, jax.device_get(tree), force=True)
    checkpointer.wait_until_finished()
    return True


def load_orbax_checkpoint(directory: str, step: int,
                          target: Optional[Any] = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(directory, f'orbax_{step:06d}'))
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(path, target)
