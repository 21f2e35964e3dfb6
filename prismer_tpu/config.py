"""Typed configuration layer.

Preserves the reference's config surfaces so its YAML/JSON configs port 1:1
(reference: configs/prismer.json, configs/{caption,vqa,pretrain,
classification,experts}.yaml; loaded at e.g. train_caption.py:43 and
model/prismer.py:29), while giving this framework a single typed entry point.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import yaml

_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")

# CLIP vision tower geometry per published model name. The reference derives
# these from downloaded checkpoint tensors (model/modules/vit.py:211-214); we
# make them an explicit registry so the model can be built without weights.
VIT_GEOMETRY: Dict[str, Dict[str, int]] = {
    "ViT-B/32": dict(patch_size=32, width=768, layers=12, heads=12),
    "ViT-B/16": dict(patch_size=16, width=768, layers=12, heads=12),
    "ViT-L/14": dict(patch_size=14, width=1024, layers=24, heads=16),
    "ViT-L/14@336px": dict(patch_size=14, width=1024, layers=24, heads=16),
    "ViT-H/14": dict(patch_size=14, width=1280, layers=32, heads=16),
    "ViT-Tiny-Test": dict(patch_size=16, width=64, layers=2, heads=4),
}

# expert name -> input channel count (reference: model/prismer.py:18-27)
EXPERT_CHANNELS: Dict[str, int] = {
    "rgb": 3,
    "depth": 1,
    "edge": 1,
    "normal": 3,
    "seg": 64,
    "obj_detection": 64,
    "ocr_detection": 64,
}


def canonical_expert(name: str) -> str:
    """'seg_coco' / 'seg_ade' share the 'seg' stem (model/prismer.py:24-25)."""
    return "seg" if "seg" in name else name


def expert_channel_map(experts: Any) -> Dict[str, int]:
    """Derive the modality->channels dict, always led by rgb.

    Mirrors model/prismer.py:17-27: 'none' (PrismerZ) means RGB only.
    """
    out = {"rgb": 3}
    if experts in (None, "none", []):
        return out
    for exp in experts:
        out[canonical_expert(exp)] = EXPERT_CHANNELS[canonical_expert(exp)]
    return out


@dataclasses.dataclass(frozen=True)
class TextDecoderConfig:
    """RoBERTa-style decoder hyper-params (configs/prismer.json schema)."""

    model_name: str = "roberta-base"
    vocab_size: int = 50265
    hidden_size: int = 768
    vision_hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    bos_token_id: int = 0
    eos_token_id: int = 2
    is_decoder: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


@dataclasses.dataclass(frozen=True)
class VisionEncoderConfig:
    """Multi-modal ViT encoder hyper-params.

    `experts` maps canonical modality name -> input channels, rgb first
    (reference: model/modules/vit.py:78-131).
    """

    name: str = "ViT-B/16"
    image_resolution: int = 224
    label_resolution: int = 224  # expert label maps are fixed 224x224 (dataset/utils.py:43)
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    experts: Tuple[Tuple[str, int], ...] = (("rgb", 3),)
    resampler_layers: int = 4
    resampler_heads: int = 8
    resampler_latents: int = 64
    num_instance_slots: int = 128  # instance embedding rows (vit.py:126)
    max_instances: int = 256  # uint8 instance-id space for obj_detection maps

    @property
    def experts_dict(self) -> Dict[str, int]:
        return dict(self.experts)

    @property
    def rgb_tokens(self) -> int:
        return (self.image_resolution // self.patch_size) ** 2

    @property
    def has_experts(self) -> bool:
        return len(self.experts) > 1

    @property
    def num_output_tokens(self) -> int:
        """Encoder output length: RGB patch tokens (+64 latents with experts)."""
        n = self.rgb_tokens
        if self.has_experts:
            n += self.resampler_latents
        return n


@dataclasses.dataclass(frozen=True)
class PrismerConfig:
    """Full model config = vision encoder + text decoder + task knobs."""

    vision: VisionEncoderConfig
    decoder: TextDecoderConfig
    prismer_model: str = "prismer_base"
    freeze: str = "freeze_vision"  # none|freeze_lang|freeze_vision|freeze_lang_vision
    dtype: str = "bfloat16"  # compute dtype; LayerNorm/softmax are always fp32

    @property
    def experts(self) -> Dict[str, int]:
        return self.vision.experts_dict


def _load_registry() -> Dict[str, Any]:
    with open(os.path.join(_CONFIG_DIR, "prismer.json")) as f:
        return json.load(f)


def build_prismer_config(task_config: Dict[str, Any]) -> PrismerConfig:
    """Build a PrismerConfig from a reference-schema task config dict.

    Accepts exactly the YAML dicts the reference trains from, e.g.
    configs/caption.yaml's 'coco' entry with keys: experts, image_resolution,
    prismer_model, freeze (model/prismer.py:16-36).
    """
    registry = _load_registry()
    model_name = task_config.get("prismer_model", "prismer_base")
    entry = registry[model_name]
    dec_kwargs = {
        k: v for k, v in entry["roberta_model"].items()
        if k in {f.name for f in dataclasses.fields(TextDecoderConfig)}
    }
    decoder = TextDecoderConfig(**dec_kwargs)

    vit_name = entry["vit_model"]
    geom = VIT_GEOMETRY[vit_name]
    experts = expert_channel_map(task_config.get("experts", "none"))
    vision = VisionEncoderConfig(
        name=vit_name,
        image_resolution=int(task_config.get("image_resolution", 224)),
        experts=tuple(experts.items()),
        **geom,
    )
    return PrismerConfig(
        vision=vision,
        decoder=decoder,
        prismer_model=model_name,
        freeze=task_config.get("freeze", "none"),
        dtype=task_config.get("dtype", "bfloat16"),
    )


def load_task_config(path: str, target: Optional[str] = None) -> Dict[str, Any]:
    """Load a task YAML; `target` selects the dataset key for keyed YAMLs
    (reference: train_caption.py:43 `yaml.load(...)[args.target_dataset]`)."""
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if target is not None:
        cfg = cfg[target]
    return cfg


def default_config_path(task: str) -> str:
    return os.path.join(_CONFIG_DIR, f"{task}.yaml")


def tiny_test_config(experts: Optional[List[str]] = None,
                     image_resolution: int = 64) -> Dict[str, Any]:
    """A tiny reference-schema task config for unit tests."""
    return {
        "dataset": "demo",
        "experts": experts if experts is not None else "none",
        "image_resolution": image_resolution,
        "prismer_model": "prismer_tiny",
        "freeze": "freeze_vision",
        "prefix": "A picture of",
        "batch_size_train": 2,
        "batch_size_test": 2,
        "init_lr": 1e-4,
        "weight_decay": 0.05,
        "min_lr": 0.0,
        "max_epoch": 1,
    }
