"""Optimizer construction: freeze-mode partitions + AdamW.

The reference mutates requires_grad per freeze mode (model/prismer.py:39-59)
and filters params into torch AdamW (train_caption.py:111). JAX-native, the
same semantics are an `optax.multi_transform` partition over the param
pytree — frozen leaves get `set_to_zero` (no optimizer state allocated, so a
ZeRO-sharded optimizer automatically excludes them, replacing the
FSDP ignored_modules machinery at model/prismer.py:61-94).

Freeze rules (exact translation of the name predicates):
  freeze_lang        — decoder layer blocks frozen EXCEPT cross-attention
                       ('1.self'/'1.output' in reference names) and adaptors;
                       embeddings, LM head, final output_layer stay trainable.
  freeze_vision      — ViT trunk blocks ('transformer.resblocks') frozen
                       except their adaptors; stems/pos-embeds/resampler/
                       ln_pre/ln_post stay trainable.
  freeze_lang_vision — both.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import optax

TRAIN = "trainable"
FROZEN = "frozen"


def _vision_frozen(path: Tuple[str, ...]) -> bool:
    in_trunk = any(p.startswith("resblocks_") for p in path)
    return in_trunk and "adaptor" not in path


def _lang_frozen(path: Tuple[str, ...]) -> bool:
    in_layer = any(p.startswith("layers_") for p in path)
    keep = {"cross_attn", "cross_out", "adaptor"}
    return in_layer and not any(p in keep for p in path)


def freeze_labels(params: Dict[str, Any], mode: str) -> Dict[str, Any]:
    """Pytree of 'trainable'/'frozen' labels matching model/prismer.py:39-59."""
    def label(key_path, _leaf) -> str:
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in key_path)
        if mode in ("freeze_vision", "freeze_lang_vision"):
            if "expert_encoder" in path and _vision_frozen(path):
                return FROZEN
        if mode in ("freeze_lang", "freeze_lang_vision"):
            if "text_decoder" in path and _lang_frozen(path):
                return FROZEN
        return TRAIN

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(lr_schedule: Callable, weight_decay: float,
                   params: Dict[str, Any], freeze_mode: str = "none"
                   ) -> optax.GradientTransformation:
    """AdamW (torch defaults: b1=0.9 b2=0.999 eps=1e-8, decoupled wd applied
    to every trainable param — the reference does not exempt LN/bias,
    train_caption.py:111-112) partitioned by freeze mode."""
    adamw = optax.adamw(learning_rate=lr_schedule, b1=0.9, b2=0.999,
                        eps=1e-8, weight_decay=weight_decay)
    if freeze_mode == "none":
        return adamw
    labels = freeze_labels(params, freeze_mode)
    return optax.multi_transform(
        {TRAIN: adamw, FROZEN: optax.set_to_zero()}, labels)


def count_params(params: Dict[str, Any], labels: Dict[str, Any] = None
                 ) -> Dict[str, int]:
    """Total / trainable parameter counts (for logging parity checks)."""
    import numpy as np
    total = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    if labels is None:
        return {"total": total, "trainable": total}
    flat_p = jax.tree.leaves(params)
    flat_l = jax.tree.leaves(labels)
    trainable = sum(int(np.prod(np.shape(p)))
                    for p, l in zip(flat_p, flat_l) if l == TRAIN)
    return {"total": total, "trainable": trainable}
