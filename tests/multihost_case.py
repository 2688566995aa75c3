"""Shared fixture logic for the two-process multi-host test.

Imported both by the in-process expected-value computation (under pytest's
8-virtual-device CPU config) and by the subprocess workers, so the model,
optimizer state and batch are constructed identically in all three places.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

TINY: dict[str, Any] = dict(
    dim=64, depth=1, heads=2, dim_head=32, ff_mult=2, dropout=0.0,
    mel_dim=16, vocab_size=65, text_dim=32, conv_layers=1,
)

BATCH, T = 4, 64


def build_state(model: Any, tx: Any, train_state_cls: Any) -> Any:
    x = jnp.zeros((1, T, TINY["mel_dim"]), jnp.float32)
    text = jnp.zeros((1, T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, x, text, jnp.zeros((1,)))
    params = variables["params"]
    return train_state_cls(
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        step=jnp.asarray(0, jnp.int32),
        ema_updates=jnp.asarray(0, jnp.int32),
    )


def global_batch() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(0)
    return {
        "mel": rng.normal(size=(BATCH, TINY["mel_dim"], T)).astype(np.float32),
        "text_ids": rng.integers(0, 64, size=(BATCH, T)).astype(np.int32),
        "mel_lengths": np.asarray([T, T - 8, T, T - 16], np.int32),
    }


def local_slice(
    batch: dict[str, np.ndarray], pid: int, nproc: int
) -> dict[str, np.ndarray]:
    per = BATCH // nproc
    return {k: v[pid * per: (pid + 1) * per] for k, v in batch.items()}
