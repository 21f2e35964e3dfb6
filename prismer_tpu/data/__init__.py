from prismer_tpu.data.datasets import (Caption, Classification, Pretrain,
                                       VQA, create_dataset)
from prismer_tpu.data.device import materialize_experts
from prismer_tpu.data.loader import DataLoader, create_loader
from prismer_tpu.data.text import pre_caption, pre_question
from prismer_tpu.data.transform import Transform

__all__ = ["Caption", "Classification", "Pretrain", "VQA", "create_dataset",
           "create_loader", "DataLoader", "Transform", "pre_caption",
           "pre_question", "materialize_experts"]
