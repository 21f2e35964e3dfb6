"""Functional training state."""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any
    rng: jax.Array

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation,
               batch_stats: Any = None, rng: Optional[jax.Array] = None
               ) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32),
                   params=params,
                   opt_state=tx.init(params),
                   batch_stats=batch_stats if batch_stats is not None else {},
                   rng=rng if rng is not None else jax.random.key(0))

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
