from prismer_tpu.models.prismer import Prismer
from prismer_tpu.models.roberta import RobertaCausalDecoder, label_smoothed_loss
from prismer_tpu.models.vit import VisionTransformer

__all__ = ["Prismer", "RobertaCausalDecoder", "VisionTransformer",
           "label_smoothed_loss"]
