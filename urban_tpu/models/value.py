"""Value head (reference: urban_planning/models/value.py:4-39)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class UrbanPlanningValue(nn.Module):
    shared_net: nn.Module
    hidden_size: Sequence[int]

    @nn.compact
    def __call__(self, obs):
        _, _, state_value, _, _, _ = self.shared_net(obs)
        x = state_value
        for i, f in enumerate(self.hidden_size):
            x = nn.Dense(f)(x)
            if i < len(self.hidden_size) - 1:
                x = jnp.tanh(x)
        return x
